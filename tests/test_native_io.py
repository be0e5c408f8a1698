"""Native JPEG decoder tests (skipped when native/libfacet_io.so isn't built)."""

import numpy as np
import pytest
from PIL import Image

from facet_tpu.utils import native_decode

pytestmark = pytest.mark.skipif(not native_decode.available(),
                                reason="native library not built")


@pytest.fixture
def jpegs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(120, 160), (64, 48), (200, 200)]):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append((p, arr))
    return paths


def test_batch_decode_matches_pil(jpegs):
    paths = [p for p, _ in jpegs]
    decoded = native_decode.decode_jpeg_batch(paths, n_threads=2)
    assert decoded is not None and len(decoded) == 3
    for (path, _), arr in zip(jpegs, decoded):
        pil = np.asarray(Image.open(path).convert("RGB"))
        assert arr.shape == pil.shape
        # both decode the same JPEG; IDCT rounding may differ by ±1
        assert np.abs(arr.astype(int) - pil.astype(int)).max() <= 1


def test_failure_slots_are_none(jpegs, tmp_path):
    bad = str(tmp_path / "broken.jpg")
    with open(bad, "wb") as fh:
        fh.write(b"not a jpeg")
    missing = str(tmp_path / "missing.jpg")
    decoded = native_decode.decode_jpeg_batch([jpegs[0][0], bad, missing])
    assert decoded[0] is not None
    assert decoded[1] is None
    assert decoded[2] is None


def test_exif_orientation_applied(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (40, 80, 3), dtype=np.uint8)
    path = str(tmp_path / "rot.jpg")
    img = Image.fromarray(arr)
    exif = img.getexif()
    exif[274] = 6  # rotate 90 CW
    img.save(path, quality=95, exif=exif)

    decoded = native_decode.decode_jpeg_batch([path])[0]
    from PIL import ImageOps

    want = np.asarray(ImageOps.exif_transpose(Image.open(path)).convert("RGB"))
    assert decoded.shape == want.shape == (80, 40, 3)
    assert np.abs(decoded.astype(int) - want.astype(int)).max() <= 1


def test_decode_time_downscale(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (1600, 2400, 3), dtype=np.uint8)
    path = str(tmp_path / "big.jpg")
    Image.fromarray(arr).save(path, quality=85)
    decoded = native_decode.decode_jpeg_batch([path], max_long_edge=1200)[0]
    # 2400 long edge with 1/2 DCT scaling -> 1200
    assert decoded.shape == (800, 1200, 3)


class TestThumbnailEncoder:
    """facet_encode_thumbnail_batch: threaded area-resize + libjpeg encode
    (round 5 — the largest single-core host-epilogue cost in the engine)."""

    def test_encode_batch_round_trips(self):
        assert native_decode.encode_available()
        rng = np.random.default_rng(2)
        # smooth gradients: JPEG q80 reproduces them closely, so the
        # decode-back comparison is meaningful
        def smooth(h, w, seed):
            y = np.linspace(0, 255, h)[:, None]
            x = np.linspace(0, 255, w)[None, :]
            base = np.stack([y + 0 * x, 0 * y + x, (y + x) / 2], axis=-1)
            return (base + rng.integers(0, 8, (h, w, 3))).clip(0, 255).astype(np.uint8)

        arrays = [smooth(480, 640, 0), smooth(100, 300, 1), smooth(50, 40, 2)]
        blobs = native_decode.encode_thumbnail_batch(
            arrays, size=320, quality=85, n_threads=2)
        assert blobs is not None and all(b is not None for b in blobs)
        import io

        # 480x640 -> long edge 320 (240x320); 100x300 and 50x40 already
        # fit inside 320 -> unresized
        want_shapes = [(240, 320), (100, 300), (50, 40)]
        for blob, arr, want in zip(blobs, arrays, want_shapes):
            img = Image.open(io.BytesIO(blob))
            assert img.format == "JPEG"
            got = np.asarray(img.convert("RGB"))
            assert got.shape[:2] == want
            # content sanity: compare against PIL's own resize of the
            # source — area-average vs bicubic differ by a few levels on
            # smooth content, far below a mismatch/garbled buffer
            ref = np.asarray(
                Image.fromarray(arr).resize((want[1], want[0]))
                .convert("RGB"), dtype=np.float64)
            err = np.abs(got.astype(np.float64) - ref).mean()
            assert err < 8.0, err

    def test_matches_pil_thumbnail_sizing(self):
        """Long-edge semantics equal PIL.thumbnail's fit-inside box."""
        rng = np.random.default_rng(3)
        # the extreme ratios pin PIL's round_aspect (floor/ceil by aspect
        # error, NOT half-up: 131x8000 @640 is 640x11, not 640x10)
        for h, w in [(1024, 1536), (333, 77), (640, 640), (131, 8000),
                     (8000, 131), (99, 1000)]:
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            blob = native_decode.encode_thumbnail_batch([arr], size=640)[0]
            import io

            got = Image.open(io.BytesIO(blob)).size   # (w, h)
            pil = Image.fromarray(arr)
            pil.thumbnail((640, 640))
            assert got == pil.size, (got, pil.size, (h, w))

    def test_engine_uses_native_thumbnails(self, tmp_path, monkeypatch):
        """assemble_row accepts a precomputed thumbnail and stores it."""
        from facet_tpu.processing.scorer import Facet

        sc = Facet(db_path=str(tmp_path / "t.db"))
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
        blob = native_decode.encode_thumbnail_batch([arr], size=64)[0]
        row = sc.assemble_row(
            "/x/a.jpg", arr, Image.fromarray(arr), {}, _tech_stub(),
            "ab" * 8, (6.0, b"\0" * 3072), None, [],
            with_composition=False, thumbnail=blob)
        assert row["thumbnail"] == blob


def _tech_stub():
    return {
        "raw_sharpness_variance": 100.0, "tech_sharpness": 2.0,
        "raw_color_entropy": 10.0, "color_score": 6.5,
        "histogram_data": b"\0" * 1024, "histogram_spread": 50.0,
        "mean_luminance": 0.5, "histogram_bimodality": -1.2,
        "exposure_score": 6.0, "shadow_clipped": 0, "highlight_clipped": 0,
        "is_silhouette": 0, "is_monochrome": 0, "mean_saturation": 0.4,
        "dynamic_range_stops": 6.0, "noise_sigma": 2.0,
        "contrast_score": 5.0,
    }
