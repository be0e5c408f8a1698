"""Golden tests for the device metric kernels vs an independent cv2/numpy
oracle implementing the reference formulas (analyzers/technical.py)."""

import struct

import cv2
import numpy as np
import pytest

from facet_tpu.analyzers.technical import TechnicalAnalyzer
from facet_tpu.ops.stats import compute_batch_stats


# ---------------------------------------------------------------- oracle
# The oracle mirrors the reference implementation exactly, using OpenCV.

def oracle_metrics(rgb, shadow_t=0.15, highlight_t=0.10, mono_t=0.10):
    bgr = rgb[..., ::-1].copy()
    gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    hsv = cv2.cvtColor(bgr, cv2.COLOR_BGR2HSV)
    out = {}

    lap = cv2.Laplacian(gray, cv2.CV_64F)
    out["raw_variance"] = lap.var()
    out["sharpness"] = float(min(10.0, lap.var() / 50.0))

    hist_hs = cv2.calcHist([hsv], [0, 1], None, [180, 256], [0, 180, 0, 256])
    p = hist_hs / hist_hs.sum()
    nz = p > 0
    out["raw_entropy"] = float(-np.sum(p[nz] * np.log2(p[nz])))

    hist = cv2.calcHist([gray], [0], None, [256], [0, 256]).flatten()
    hn = hist / hist.sum()
    out["histogram_bytes"] = struct.pack("256f", *hn)
    bins = np.arange(256)
    mean_val = np.sum(bins * hn)
    out["spread"] = round(float(np.sqrt(np.sum(((bins - mean_val) ** 2) * hn))), 4)
    out["mean_luminance"] = round(float(mean_val / 255.0), 4)
    shadow_mass = np.sum(hn[:30])
    highlight_mass = np.sum(hn[225:])
    out["shadow_clipped"] = 1 if shadow_mass > shadow_t else 0
    out["highlight_clipped"] = 1 if highlight_mass > highlight_t else 0
    lower, upper = np.sum(hn[:85]), np.sum(hn[170:])
    out["is_silhouette"] = 1 if (lower > 0.35 and upper > 0.25) else 0
    from scipy.stats import kurtosis

    bim = -kurtosis(hn * 256, fisher=True)
    out["bimodality"] = round(float(bim), 4)
    lum_pen = abs(out["mean_luminance"] * 255 / 255 - 0.5) * 8  # same as ref
    lum_pen = abs(mean_val / 255.0 - 0.5) * 8
    spread_bonus = min(4.0, float(np.sqrt(np.sum(((bins - mean_val) ** 2) * hn))) / 20.0)
    bim_pen = max(0, bim - 1.0) * 0.6
    clip_pen = 0 if out["is_silhouette"] else shadow_mass * 4.0 + highlight_mass * 5.0
    out["exposure_score"] = round(
        float(max(0, min(10.0, 7.0 - lum_pen + spread_bonus - bim_pen - clip_pen))), 2
    )

    mean_sat = np.mean(hsv[:, :, 1]) / 255.0
    out["is_monochrome"] = 1 if mean_sat < mono_t else 0
    out["mean_saturation"] = round(float(mean_sat), 4)

    p2, p98 = np.percentile(gray, 2), np.percentile(gray, 98)
    if p2 < 1:
        p2 = 1
    out["dynamic_range_stops"] = round(float(np.log2(max(p98, 1) / p2)), 2)

    g64 = gray.astype(np.float64)
    h, w = g64.shape
    M = np.array([[1, -2, 1], [-2, 4, -2], [1, -2, 1]])
    sigma = np.sum(np.abs(cv2.filter2D(g64, -1, M)))
    out["noise_sigma"] = round(float(sigma * np.sqrt(0.5 * np.pi) / (6 * (w - 2) * (h - 2))), 2)

    p5, p95 = np.percentile(g64, [5, 95])
    pc = (p95 - p5) / 255.0
    rms = np.std(g64) / 255.0
    out["contrast_score"] = round(float(min(10.0, pc * 5.0 + rms * 20.0)), 2)
    out["percentile_contrast"] = round(float(pc), 4)
    out["rms_contrast"] = round(float(rms), 4)
    return out


# ---------------------------------------------------------------- fixtures

def synthetic_images():
    rng = np.random.default_rng(42)
    imgs = {}
    # horizontal gradient
    g = np.tile(np.linspace(0, 255, 320, dtype=np.uint8), (240, 1))
    imgs["gradient"] = np.stack([g, g, g], axis=-1)
    # uniform noise (sharp + noisy)
    imgs["noise"] = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    # checkerboard (bimodal histogram, high contrast)
    ch = np.indices((240, 320)).sum(axis=0) % 2 * 255
    imgs["checker"] = np.stack([ch, ch, ch], axis=-1).astype(np.uint8)
    # colorful blocks
    imgs["colors"] = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8).repeat(4, 0).repeat(4, 1)
    # dark with bright spot (silhouette-like)
    dark = np.full((240, 320, 3), 10, np.uint8)
    dark[:80, :, :] = 250
    imgs["backlit"] = dark
    # low saturation (monochrome-ish)
    base = rng.integers(100, 156, (120, 160, 1), dtype=np.uint8)
    imgs["mono"] = np.repeat(base, 3, axis=-1)
    # odd shape (non-multiple of tile sizes)
    imgs["odd"] = rng.integers(0, 256, (123, 77, 3), dtype=np.uint8)
    return imgs


def _color_sample():
    """~1.3M RGB colors: a deterministic stride through the cube plus all
    boundary-channel combinations (exhaustive full-cube parity was verified
    once; this keeps the suite fast while covering the rounding hot spots)."""
    stride = np.arange(0, 1 << 24, 13, dtype=np.uint32)
    edges = np.array([0, 1, 127, 128, 254, 255], dtype=np.uint32)
    grid = (edges[:, None, None] << 16 | edges[None, :, None] << 8
            | edges[None, None, :]).reshape(-1)
    all_colors = np.concatenate([stride, grid])
    n = all_colors.size
    pad = (-n) % 4096
    all_colors = np.concatenate([all_colors, np.zeros(pad, np.uint32)])
    rgb = np.stack(
        [(all_colors >> 16) & 255, (all_colors >> 8) & 255, all_colors & 255],
        axis=-1,
    ).astype(np.uint8)
    return rgb.reshape(-1, 4096, 3)


class TestColorspaceExact:
    def test_gray_cube_sample(self):
        from facet_tpu.ops.colorspace import rgb_to_gray
        import jax.numpy as jnp

        rgb = _color_sample()
        got = np.asarray(rgb_to_gray(jnp.asarray(rgb)))
        want = cv2.cvtColor(rgb[..., ::-1].copy(), cv2.COLOR_BGR2GRAY)
        assert np.array_equal(got, want.astype(np.int32))

    def test_hsv_cube_sample(self):
        from facet_tpu.ops.colorspace import rgb_to_hsv
        import jax.numpy as jnp

        rgb = _color_sample()
        h, s, v = rgb_to_hsv(jnp.asarray(rgb))
        want = cv2.cvtColor(rgb[..., ::-1].copy(), cv2.COLOR_BGR2HSV)
        assert np.array_equal(np.asarray(h), want[..., 0].astype(np.int32))
        assert np.array_equal(np.asarray(s), want[..., 1].astype(np.int32))
        assert np.array_equal(np.asarray(v), want[..., 2].astype(np.int32))


class TestMetricParity:
    @pytest.fixture(scope="class")
    def results(self):
        imgs = synthetic_images()
        names = list(imgs)
        analyzer = TechnicalAnalyzer()
        ours = analyzer.analyze_batch([imgs[n] for n in names])
        golden = [oracle_metrics(imgs[n]) for n in names]
        return names, ours, golden

    def test_sharpness(self, results):
        for name, got, want in zip(*results):
            assert got["raw_sharpness_variance"] == pytest.approx(
                want["raw_variance"], abs=1e-6), name
            assert got["tech_sharpness"] == pytest.approx(want["sharpness"], abs=1e-9), name

    def test_color_entropy(self, results):
        for name, got, want in zip(*results):
            assert got["raw_color_entropy"] == pytest.approx(
                want["raw_entropy"], abs=5e-4), name

    def test_histogram_block(self, results):
        for name, got, want in zip(*results):
            assert got["histogram_data"] == want["histogram_bytes"], name
            assert got["histogram_spread"] == pytest.approx(want["spread"], abs=1e-3), name
            assert got["mean_luminance"] == pytest.approx(want["mean_luminance"], abs=1e-4), name
            assert got["histogram_bimodality"] == pytest.approx(
                want["bimodality"], abs=1e-3), name
            assert got["exposure_score"] == pytest.approx(want["exposure_score"], abs=1e-2), name
            assert got["shadow_clipped"] == want["shadow_clipped"], name
            assert got["highlight_clipped"] == want["highlight_clipped"], name
            assert got["is_silhouette"] == want["is_silhouette"], name

    def test_monochrome(self, results):
        for name, got, want in zip(*results):
            assert got["mean_saturation"] == pytest.approx(want["mean_saturation"], abs=1e-4), name
            assert got["is_monochrome"] == want["is_monochrome"], name

    def test_dynamic_range(self, results):
        for name, got, want in zip(*results):
            assert got["dynamic_range_stops"] == pytest.approx(
                want["dynamic_range_stops"], abs=1e-2), name

    def test_noise(self, results):
        for name, got, want in zip(*results):
            assert got["noise_sigma"] == pytest.approx(want["noise_sigma"], abs=1e-2), name

    def test_contrast(self, results):
        for name, got, want in zip(*results):
            assert got["contrast_score"] == pytest.approx(want["contrast_score"], abs=1e-2), name
            assert got["percentile_contrast"] == pytest.approx(
                want["percentile_contrast"], abs=1e-4), name
            assert got["rms_contrast"] == pytest.approx(want["rms_contrast"], abs=1e-4), name


class TestBatching:
    def test_mixed_shapes_alignment(self):
        rng = np.random.default_rng(7)
        imgs = [
            rng.integers(0, 256, (64, 48, 3), dtype=np.uint8),
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8),
            rng.integers(0, 256, (64, 48, 3), dtype=np.uint8),
        ]
        stats = compute_batch_stats(imgs)
        for img, s in zip(imgs, stats):
            assert (s.height, s.width) == img.shape[:2]
            assert s.gray_hist.sum() == img.shape[0] * img.shape[1]

    def test_rejects_tiny_and_wrong_rank(self):
        with pytest.raises(ValueError):
            compute_batch_stats([np.zeros((2, 10, 3), np.uint8)])
        with pytest.raises(ValueError):
            compute_batch_stats([np.zeros((10, 10), np.uint8)])


class TestIsoAdjustment:
    def test_low_iso_passthrough(self):
        assert TechnicalAnalyzer.iso_adjusted_sharpness(100.0, 100) == 100.0
        assert TechnicalAnalyzer.iso_adjusted_sharpness(100.0, None) == 100.0

    def test_high_iso_boost(self):
        got = TechnicalAnalyzer.iso_adjusted_sharpness(100.0, 800)
        assert got == pytest.approx(100.0 * (1 + 0.15 * np.log2(8)))


class TestPhash:
    def test_deterministic_and_locality(self):
        from facet_tpu.ops.phash import phash_batch, hamming_distance

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
        h1, h2 = phash_batch([img, img.copy()])
        assert h1 == h2 and len(h1) == 16
        # small perturbation -> small distance; different image -> large
        noisy = img.copy()
        noisy[:4, :4] += 1
        h3 = phash_batch([noisy])[0]
        assert hamming_distance(h1, h3) <= 4
        other = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
        h4 = phash_batch([other])[0]
        assert hamming_distance(h1, h4) > 10

    def test_resize_invariance(self):
        """The same picture at different resolutions should hash nearby."""
        from facet_tpu.ops.phash import phash_batch, hamming_distance
        import cv2 as _cv2

        rng = np.random.default_rng(5)
        base = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
        big = _cv2.resize(base, (400, 300), interpolation=_cv2.INTER_LINEAR)
        small = _cv2.resize(base, (200, 150), interpolation=_cv2.INTER_LINEAR)
        hb, hs = phash_batch([big, small])
        assert hamming_distance(hb, hs) <= 6


class TestEntropyRadixPacking:
    """The H-S entropy packs two S bins per matmul column (entries
    {0, 1, 4096}); these inputs drive both packed fields of one column to
    their sub-chunk maximum so any field bleed would show up exactly."""

    def test_field_separation_extremes(self):
        # uniform saturated red: every pixel lands in (h=0, s=255) — the ODD
        # field of the last packed column holds the full sub-chunk count
        red = np.broadcast_to(np.array([255, 0, 0], np.uint8),
                              (256, 320, 3)).copy()
        # half (255,0,0) / half (255,1,1): joint bins (0, 255) and (0, 254)
        # — BOTH fields of the same packed column, each at half mass
        mix = red.copy()
        mix[:128] = np.array([255, 1, 1], np.uint8)
        stats = compute_batch_stats([red, mix])
        assert stats[0].hs_entropy == pytest.approx(0.0, abs=1e-6)
        assert stats[1].hs_entropy == pytest.approx(1.0, abs=1e-5)


class TestFastColorHarmony:
    """processing.fast_color_harmony: the entropy's stride-4 pixel
    subsample. Every other statistic must remain exact, and the entropy
    must equal the reference formula applied to the strided stream."""

    def test_subsample_matches_strided_oracle(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
        full = compute_batch_stats([img])[0]
        fast = compute_batch_stats([img], hs_subsample=4)[0]
        # non-entropy statistics identical
        np.testing.assert_array_equal(full.gray_hist, fast.gray_hist)
        assert full.sat_sum == fast.sat_sum
        assert full.lap_sum == fast.lap_sum
        assert full.lap_sumsq == fast.lap_sumsq
        assert full.imm_abs_sum == fast.imm_abs_sum
        # entropy == numpy oracle on every 4th pixel of the stream
        from tests.test_pallas_entropy import oracle_entropy
        from facet_tpu.ops.colorspace import rgb_to_hsv
        import jax.numpy as jnp

        hh, ss, _ = rgb_to_hsv(jnp.asarray(img[None]))
        hf = np.asarray(hh).reshape(1, -1)[:, ::4]
        sf = np.asarray(ss).reshape(1, -1)[:, ::4]
        want = oracle_entropy(hf, sf)[0]
        assert fast.hs_entropy == pytest.approx(want, abs=1e-5)

    def test_engine_reads_config_gate(self, tmp_path):
        """fast_color_harmony=true must reach the FusedScorer subsample."""
        import json

        from facet_tpu.config.default_config import build_default_config
        from facet_tpu.config.scoring_config import ScoringConfig

        cfg = build_default_config()
        cfg["processing"]["fast_color_harmony"] = True
        path = tmp_path / "scoring_config.json"
        path.write_text(json.dumps(cfg))
        config = ScoringConfig(config_path=str(path))
        assert config.get_processing_settings()["fast_color_harmony"] is True
