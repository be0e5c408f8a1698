"""Direct numeric parity against the ACTUAL reference implementation.

These tests import the reference codebase from /root/reference (skipped
when absent, e.g. in standalone checkouts) and compare:

- the aggregate "brain" on 300 random metric rows, with the REFERENCE's
  own 1,632-line scoring_config.json pinned on both sides and the
  `reference_iso_parity` flag set (the one documented divergence:
  reference processing/scorer.py:345-360's +-100 sanitizer silently
  disables its ISO compensation; the flag reproduces that);
- category routing (priority-ordered first-match over the 30 categories);
- every classical technical metric on random + structured images:
  reference analyzers/technical.py (OpenCV, per image) vs our fused
  device statistics program + float64 epilogues (BASELINE.md demands
  per-metric parity within 1e-3; these assert much tighter).
"""

import json
import os
import shutil
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "processing")),
    reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REFERENCE)
    try:
        import analyzers.technical as rt
        import config.scoring_config as rcfg
        from processing import scorer as rscorer
        yield {"technical": rt.TechnicalAnalyzer,
               "ScoringConfig": rcfg.ScoringConfig,
               "scorer": rscorer}
    finally:
        sys.path.remove(REFERENCE)


@pytest.fixture(scope="module")
def pinned_configs(ref, tmp_path_factory):
    """Both sides load the REFERENCE's scoring_config.json (weights pinned),
    each from its own writable copy (both implementations write corrected
    weights back to disk)."""
    tmp = tmp_path_factory.mktemp("parity")
    src = os.path.join(REFERENCE, "scoring_config.json")
    ref_copy = str(tmp / "ref_config.json")
    our_copy = str(tmp / "our_config.json")
    shutil.copy(src, ref_copy)
    data = json.load(open(src))
    # pin the documented divergence to the reference's effective behavior
    data.setdefault("exif_adjustments", {})["reference_iso_parity"] = True
    json.dump(data, open(our_copy, "w"))

    from facet_tpu.config.scoring_config import ScoringConfig

    return ref["ScoringConfig"](ref_copy), ScoringConfig(our_copy)


def random_rows(n=300, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        rows.append({
            "aesthetic": float(rng.uniform(0, 10)),
            "exposure_score": float(rng.uniform(0, 10)),
            "color_score": float(rng.uniform(0, 10)),
            "comp_score": float(rng.uniform(0, 10)),
            "contrast_score": float(rng.uniform(0, 10)),
            "tech_sharpness": float(rng.uniform(0, 10)),
            "face_quality": float(rng.uniform(0, 10)),
            "eye_sharpness": float(rng.uniform(0, 10)),
            "face_sharpness": float(rng.uniform(0, 10)),
            "power_point_score": float(rng.uniform(0, 10)),
            "mean_saturation": float(rng.uniform(0, 1)),
            "noise_sigma": float(rng.uniform(0, 15)),
            "histogram_bimodality": float(rng.uniform(-2, 4)),
            "histogram_spread": float(rng.uniform(0, 90)),
            "leading_lines_score": float(rng.uniform(0, 8)),
            "is_monochrome": int(rng.random() < 0.2),
            "is_silhouette": int(rng.random() < 0.1),
            "is_group_portrait": int(rng.random() < 0.1),
            "is_blink": int(rng.random() < 0.15),
            "shadow_clipped": int(rng.random() < 0.2),
            "highlight_clipped": int(rng.random() < 0.2),
            "face_count": int(rng.integers(0, 6)),
            "face_ratio": float(rng.uniform(0, 0.6)),
            "mean_luminance": float(rng.uniform(0, 1)),
            "iso": int(rng.choice([100, 200, 800, 1600, 6400])),
            "f_stop": float(rng.choice([1.4, 1.8, 2.8, 4.0, 8.0])),
            "shutter_speed": float(rng.choice([0.001, 0.02, 1.0, 30.0])),
            "focal_length": float(rng.choice([24, 50, 135, 400])),
            "isolation_bonus": float(rng.uniform(1.0, 2.0)),
            "tags": str(rng.choice(["", "animal", "mountain, sky", "food"])),
        })
    return rows


class _DummyScorer:
    """Duck-typed stand-in for a Facet instance: binds any helper method
    the aggregate path calls (e.g. _determine_photo_category,
    _parse_shutter_speed) without constructing models or a database.

    Must carry a `config` attribute: calculate_aggregate_logic's
    `config or self.config if hasattr(self, 'config') else None` resolves
    to None when self has no config, silently zeroing every weight."""

    def __init__(self, facet_cls, config):
        object.__setattr__(self, "_facet_cls", facet_cls)
        object.__setattr__(self, "config", config)

    def __getattr__(self, name):
        for klass in self._facet_cls.__mro__:
            if name in vars(klass):
                raw = vars(klass)[name]
                if isinstance(raw, staticmethod):
                    return raw.__func__
                return raw.__get__(self, type(self))
        raise AttributeError(name)


class TestAggregateParity:
    def test_brain_matches_reference_on_random_rows(self, ref, pinned_configs):
        ref_config, our_config = pinned_configs
        from facet_tpu.scoring.brain import calculate_aggregate

        Facet = ref["scorer"].Facet
        dummy = _DummyScorer(Facet, ref_config)
        mismatches = []
        for i, row in enumerate(random_rows()):
            want, want_cat = Facet.calculate_aggregate_logic(
                dummy, dict(row), config=ref_config)
            got, got_cat = calculate_aggregate(dict(row), our_config)
            if got_cat != want_cat or abs(got - want) > 1e-9:
                mismatches.append((i, want, got, want_cat, got_cat, row))
        assert not mismatches, mismatches[:3]

    def test_category_routing_matches_reference(self, ref, pinned_configs):
        ref_config, our_config = pinned_configs
        rng = np.random.default_rng(5)
        for i in range(200):
            row = {
                "face_count": int(rng.integers(0, 8)),
                "face_ratio": float(rng.uniform(0, 0.8)),
                "iso": int(rng.choice([100, 800, 3200, 12800])),
                "shutter_speed": float(rng.choice([0.0005, 0.01, 1.0, 30.0])),
                "mean_luminance": float(rng.uniform(0, 1)),
                "focal_length": float(rng.choice([14, 35, 105, 600])),
                "f_stop": float(rng.choice([1.4, 4.0, 11.0])),
                "is_monochrome": int(rng.random() < 0.3),
                "is_silhouette": int(rng.random() < 0.2),
                "is_group_portrait": int(rng.random() < 0.2),
                "mean_saturation": float(rng.uniform(0, 1)),
                "tags": str(rng.choice([
                    "", "cat, animal", "painting", "car", "food, plate",
                    "mountain, landscape", "building, street", "concert",
                ])),
            }
            want = ref_config.determine_category(dict(row))
            got = our_config.determine_category(dict(row))
            assert got == want, (i, want, got, row)


def parity_images(seed=3):
    """Random + structured test images (RGB uint8)."""
    rng = np.random.default_rng(seed)
    images = [rng.integers(0, 256, (120, 160, 3), dtype=np.uint8),
              rng.integers(0, 256, (97, 131, 3), dtype=np.uint8)]
    # gradient (smooth, low noise), saturated patches, near-monochrome
    yy, xx = np.mgrid[0:120, 0:160]
    grad = np.stack([(yy * 2) % 256, (xx * 3) % 256,
                     ((xx + yy)) % 256], axis=-1).astype(np.uint8)
    images.append(grad)
    mono = np.repeat(rng.integers(0, 256, (80, 100, 1), dtype=np.uint8), 3,
                     axis=2)
    images.append(mono)
    dark = (rng.random((90, 110, 3)) * 40).astype(np.uint8)
    images.append(dark)
    return images


class TestTechnicalMetricParity:
    """Our device statistics vs the reference's OpenCV implementations,
    on the same pixels (reference takes BGR)."""

    @pytest.fixture(scope="class")
    def computed(self, ref):
        import cv2

        from facet_tpu.analyzers.technical import TechnicalAnalyzer

        images = parity_images()
        ours = TechnicalAnalyzer().analyze_batch(images)
        RT = ref["technical"]
        theirs = []
        for img in images:
            bgr = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
            row = {}
            row.update({"sharp_" + k: v for k, v in
                        RT.get_sharpness_data(bgr).items()})
            row.update({"color_" + k: v for k, v in
                        RT.get_color_harmony_data(bgr).items()})
            row.update(RT.get_histogram_data(bgr))
            mono = RT.detect_monochrome(bgr)
            row["is_monochrome"] = mono["is_monochrome"] if isinstance(
                mono, dict) else mono
            if isinstance(mono, dict):
                row["mean_saturation"] = mono.get("mean_saturation")
            row.update(RT.get_dynamic_range(bgr))
            row.update(RT.get_noise_estimate(bgr))
            row.update(RT.get_contrast_score(bgr))
            theirs.append(row)
        return images, ours, theirs

    def test_sharpness(self, computed):
        _, ours, theirs = computed
        for o, t in zip(ours, theirs):
            assert o["raw_sharpness_variance"] == pytest.approx(
                t["sharp_raw_variance"], rel=1e-9)
            assert o["tech_sharpness"] == pytest.approx(
                t["sharp_normalized"], abs=1e-9)

    def test_color_harmony(self, computed):
        # the joint entropy reduces in f32 on device (46k bins): observed
        # agreement ~3e-5 bits vs the reference's f64 numpy — far inside
        # the 1e-3 per-metric goal (BASELINE.md)
        _, ours, theirs = computed
        for o, t in zip(ours, theirs):
            assert o["raw_color_entropy"] == pytest.approx(
                t["color_raw_entropy"], abs=1e-4)
            assert o["color_score"] == pytest.approx(
                t["color_normalized"], abs=1e-4)

    def test_histogram_suite(self, computed):
        _, ours, theirs = computed
        for o, t in zip(ours, theirs):
            for key in ("histogram_spread", "mean_luminance",
                        "histogram_bimodality", "exposure_score"):
                ref_key = {"histogram_spread": "spread",
                           "mean_luminance": "mean_luminance",
                           "histogram_bimodality": "bimodality",
                           "exposure_score": "exposure_score"}[key]
                assert o[key] == pytest.approx(t[ref_key], abs=1e-6), key
            for key in ("shadow_clipped", "highlight_clipped",
                        "is_silhouette"):
                assert int(o[key]) == int(t[key]), key
            np.testing.assert_allclose(
                np.frombuffer(o["histogram_data"], np.float32),
                np.frombuffer(t["histogram_bytes"], np.float32),
                atol=1e-7)

    def test_monochrome(self, computed):
        _, ours, theirs = computed
        for o, t in zip(ours, theirs):
            assert int(o["is_monochrome"]) == int(t["is_monochrome"])
            if t.get("mean_saturation") is not None:
                assert o["mean_saturation"] == pytest.approx(
                    t["mean_saturation"], abs=1e-6)

    def test_dynamic_range(self, computed):
        _, ours, theirs = computed
        for o, t in zip(ours, theirs):
            for key in set(o) & set(t):
                if key.startswith("dynamic") or key.endswith("stops"):
                    assert o[key] == pytest.approx(t[key], abs=1e-6), key

    def test_noise(self, computed):
        _, ours, theirs = computed
        for o, t in zip(ours, theirs):
            common = set(o) & set(t)
            assert any("noise" in k for k in common)
            for key in common:
                if "noise" in key:
                    assert o[key] == pytest.approx(t[key], rel=1e-6), key

    def test_contrast(self, computed):
        _, ours, theirs = computed
        for o, t in zip(ours, theirs):
            for key in set(o) & set(t):
                if "contrast" in key:
                    assert o[key] == pytest.approx(t[key], abs=1e-6), key


class TestCompositionParity:
    """Subject detection, placement math and leading lines vs the
    reference's analyzers/composition.py on structured images."""

    @pytest.fixture(scope="class")
    def comp(self, ref):
        sys.path.insert(0, REFERENCE)
        try:
            from analyzers.composition import CompositionAnalyzer as RefComp
        finally:
            sys.path.remove(REFERENCE)
        from facet_tpu.analyzers.composition import CompositionAnalyzer

        return RefComp, CompositionAnalyzer()

    def images(self):
        import cv2

        out = []
        for seed in range(6):
            r = np.random.default_rng(seed)
            img = (r.random((120, 160, 3)) * 60).astype(np.uint8)
            cv2.circle(img, (int(r.uniform(30, 130)), int(r.uniform(30, 90))),
                       20, (220, 200, 180), -1)
            if seed % 2:
                cv2.line(img, (0, 110), (159, 10), (250, 250, 250), 2)
            out.append(img)
        return out

    def test_subject_and_placement_match(self, comp):
        import cv2

        RefComp, ours = comp
        for i, img in enumerate(self.images()):
            bgr = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
            rb = RefComp.detect_subject_region(bgr)
            ob = ours.detect_subject_region(img)
            assert (rb is None) == (ob is None), i
            if rb is None:
                continue
            assert list(rb) == list(ob), i
            rp = RefComp.get_placement_data(rb, bgr.shape[1], bgr.shape[0])
            op = ours.placement_data(ob, img.shape[1], img.shape[0])
            for key in ("score", "power_point_score", "line_score",
                        "center_score"):
                assert float(op[key]) == pytest.approx(float(rp[key]),
                                                       abs=1e-6), (i, key)

    def test_leading_lines_match_when_reference_runs(self, comp):
        import cv2

        RefComp, ours = comp
        compared = 0
        for i, img in enumerate(self.images()):
            bgr = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
            try:
                rl = RefComp.detect_leading_lines(bgr)
            except TypeError:
                # the reference's own HoughLinesP unpacking fails on this
                # cv2 build for some inputs — nothing to compare against
                continue
            ol = ours.detect_leading_lines(img)
            assert ol["line_count"] == rl["line_count"], i
            assert float(ol["leading_lines_score"]) == pytest.approx(
                float(rl["leading_lines_score"]), abs=1e-6), i
            compared += 1
        assert compared >= 2, "reference ran on too few images to compare"


def _seed_parity_db(path, n=60, seed=7):
    """Byte-compatible schema + photos with engineered phash clusters and
    raw metric columns for duplicate/normalizer parity."""
    import sqlite3

    from facet_tpu.db.schema import init_database

    init_database(path)
    rng = np.random.default_rng(seed)
    base_hashes = [rng.integers(0, 2, 64).astype(np.uint8)
                   for _ in range(n // 4)]
    rows = []
    for i in range(n):
        bits = base_hashes[i % len(base_hashes)].copy()
        flip = rng.integers(0, 64, rng.integers(0, 5))
        bits[flip] ^= 1          # near-duplicates within each base cluster
        phash = "".join(format(int("".join(map(str, bits[j:j + 4])), 2), "x")
                        for j in range(0, 64, 4))
        rows.append((
            f"/photos/p{i:03d}.jpg", f"p{i:03d}.jpg",
            round(float(rng.uniform(2, 9)), 2), phash,
            ["landscape", "portrait", "macro", "default"][i % 4],
            float(rng.uniform(10, 4000)), float(rng.uniform(5, 15)),
            float(rng.uniform(10, 90)), float(rng.uniform(0, 300)),
            float(rng.uniform(0, 1)), 1,
        ))
    conn = sqlite3.connect(path)
    conn.executemany(
        "INSERT INTO photos (path, filename, aggregate, phash, category,"
        " raw_sharpness_variance, raw_color_entropy, histogram_spread,"
        " raw_eye_sharpness, mean_luminance, is_burst_lead)"
        " VALUES (?,?,?,?,?,?,?,?,?,?,?)", rows)
    conn.commit()
    conn.close()


class TestDuplicateDetectionParity:
    def test_same_groups_and_leads(self, ref, pinned_configs, tmp_path):
        """Run the REFERENCE's detect_duplicates and ours on copies of the
        same database; the duplicate partitions and lead choices must
        match (group ids may number differently)."""
        ref_config, our_config = pinned_configs
        ref_db = str(tmp_path / "ref.db")
        our_db = str(tmp_path / "our.db")
        _seed_parity_db(ref_db)        # deterministic: both DBs identical
        _seed_parity_db(our_db)

        sys.path.insert(0, REFERENCE)
        try:
            from utils.duplicate import detect_duplicates as ref_detect
            ref_detect(ref_db, config_path=ref_config.config_path)
        finally:
            sys.path.remove(REFERENCE)

        from facet_tpu.utils.duplicate import detect_duplicates

        detect_duplicates(our_db, our_config, verbose=False)

        import sqlite3

        def read(path):
            conn = sqlite3.connect(path)
            rows = conn.execute(
                "SELECT path, duplicate_group_id, is_duplicate_lead"
                " FROM photos ORDER BY path").fetchall()
            conn.close()
            groups = {}
            leads = set()
            for p, gid, lead in rows:
                if gid is not None:
                    groups.setdefault(gid, set()).add(p)
                if lead:
                    leads.add(p)
            partition = {frozenset(g) for g in groups.values()
                         if len(g) > 1}
            return partition, leads

        ref_partition, ref_leads = read(ref_db)
        our_partition, our_leads = read(our_db)
        assert our_partition == ref_partition
        assert len(ref_partition) >= 3, "fixture produced too few groups"
        # leads within multi-photo groups must agree (best aggregate wins)
        multi = set().union(*ref_partition) if ref_partition else set()
        assert our_leads & multi == ref_leads & multi


class TestNormalizerParity:
    def test_percentiles_and_normalization_match(self, ref, pinned_configs,
                                                 tmp_path):
        ref_config, our_config = pinned_configs
        db = str(tmp_path / "norm.db")
        _seed_parity_db(db, n=240)

        sys.path.insert(0, REFERENCE)
        try:
            from config.percentile_normalizer import (
                PercentileNormalizer as RefNorm,
            )
        finally:
            sys.path.remove(REFERENCE)

        settings = our_config.get_normalization_settings()
        ref_norm = RefNorm(db,
                           target_percentile=settings.get(
                               "percentile_target", 95),
                           per_category=settings.get("per_category", True),
                           category_min_samples=settings.get(
                               "category_min_samples", 50))
        ref_norm.compute_percentiles()
        ref_norm.compute_percentiles_per_category()

        from facet_tpu.config.percentile_normalizer import (
            PercentileNormalizer,
        )

        ours = PercentileNormalizer(db, our_config)
        ours.compute_percentiles()
        ours.compute_percentiles_per_category()

        rng = np.random.default_rng(9)
        metrics = ["raw_sharpness_variance", "raw_color_entropy",
                   "raw_eye_sharpness"]
        for metric in metrics:
            for _ in range(25):
                value = float(rng.uniform(0, 3000))
                category = str(rng.choice(
                    ["landscape", "portrait", "macro", "nonexistent"]))
                want = ref_norm.normalize_with_category(
                    metric, value, category)
                got = ours.normalize(metric, value, category=category)
                assert got == pytest.approx(want, abs=1e-9), (metric,
                                                              category)


def _seed_recompute_db(path, n=80, seed=13):
    """Rows with everything --recompute-average consumes: raw metrics,
    normalized score columns, 256-float histogram blobs, EXIF, faces,
    burst-friendly timestamps and near-duplicate phashes."""
    import sqlite3
    import struct

    from facet_tpu.db.schema import init_database

    init_database(path)
    rng = np.random.default_rng(seed)
    rows = []
    base_bits = [rng.integers(0, 2, 64).astype(np.uint8) for _ in range(20)]
    for i in range(n):
        hist = rng.dirichlet(np.ones(256) * 0.3).astype(np.float32)
        # consecutive blocks of 4 share a phash cluster and shoot 2 s apart
        # so both the rapid-burst and similarity grouping rules engage
        bits = base_bits[(i // 4) % 20].copy()
        bits[rng.integers(0, 64, rng.integers(0, 3))] ^= 1
        phash = "".join(format(int("".join(map(str, bits[j:j + 4])), 2), "x")
                        for j in range(0, 64, 4))
        minute = i // 4
        rows.append((
            f"/photos/r{i:03d}.jpg", f"r{i:03d}.jpg",
            f"2025:06:01 10:{minute:02d}:{(i % 4) * 2:02d}",  # EXIF format
            float(rng.uniform(2, 9)),            # aggregate (stale)
            float(rng.uniform(2, 9)),            # aesthetic
            float(rng.uniform(2, 9)),            # exposure_score (stale)
            float(rng.uniform(2, 9)),            # color_score
            float(rng.uniform(2, 9)),            # comp_score
            float(rng.uniform(2, 9)),            # contrast_score
            float(rng.uniform(2, 9)),            # tech_sharpness
            float(rng.uniform(0, 9)),            # face_quality
            float(rng.uniform(0, 9)),            # eye_sharpness
            float(rng.uniform(10, 4000)),        # raw_sharpness_variance
            float(rng.uniform(5, 15)),           # raw_color_entropy
            float(rng.uniform(0, 300)),          # raw_eye_sharpness
            float(rng.uniform(10, 90)),          # histogram_spread
            float(rng.uniform(0.05, 0.95)),      # mean_luminance
            float(rng.uniform(-1, 3)),           # histogram_bimodality
            float(rng.uniform(0, 12)),           # noise_sigma
            float(rng.uniform(0, 1)),            # mean_saturation
            float(rng.uniform(0, 8)),            # leading_lines_score
            float(rng.uniform(0, 9)),            # power_point_score
            int(rng.integers(0, 5)),             # face_count
            float(rng.uniform(0, 0.5)),          # face_ratio
            int(rng.random() < 0.15),            # is_blink
            int(rng.random() < 0.2),             # is_monochrome
            int(rng.random() < 0.1),             # is_silhouette
            float(rng.uniform(1.0, 1.8)),        # isolation_bonus
            struct.pack("256f", *hist),          # histogram_data
            ["landscape", "portrait", "macro", "default"][i % 4],
            str(rng.choice(["", "animal", "mountain, sky", "food"])),
            int(rng.choice([100, 400, 1600, 6400])),
            float(rng.choice([1.8, 2.8, 5.6])),
            "1/250", float(rng.choice([24, 50, 135])),
            phash, 1,
        ))
    conn = sqlite3.connect(path)
    conn.executemany(
        "INSERT INTO photos (path, filename, date_taken, aggregate,"
        " aesthetic, exposure_score, color_score, comp_score,"
        " contrast_score, tech_sharpness, face_quality, eye_sharpness,"
        " raw_sharpness_variance, raw_color_entropy, raw_eye_sharpness,"
        " histogram_spread, mean_luminance, histogram_bimodality,"
        " noise_sigma, mean_saturation, leading_lines_score,"
        " power_point_score, face_count, face_ratio, is_blink,"
        " is_monochrome, is_silhouette, isolation_bonus, histogram_data,"
        " category, tags,"
        " iso, f_stop, shutter_speed, focal_length, phash, is_burst_lead)"
        " VALUES (" + ",".join("?" * 37) + ")", rows)
    conn.commit()
    conn.close()


class TestRecomputeParity:
    """--recompute-average end-to-end: identical seeded databases through
    the reference's update_all_aggregates + process_bursts and through our
    engine; final aggregates, categories, refreshed scores and burst
    grouping must match."""

    @pytest.fixture(scope="class")
    def recomputed(self, ref, tmp_path_factory):
        import sqlite3

        tmp = tmp_path_factory.mktemp("recompute")
        ref_db = str(tmp / "ref.db")
        our_db = str(tmp / "our.db")
        _seed_recompute_db(ref_db)
        _seed_recompute_db(our_db)

        src = os.path.join(REFERENCE, "scoring_config.json")
        ref_cfg_path = str(tmp / "ref_config.json")
        our_cfg_path = str(tmp / "our_config.json")
        shutil.copy(src, ref_cfg_path)
        data = json.load(open(src))
        data.setdefault("exif_adjustments", {})["reference_iso_parity"] = True
        json.dump(data, open(our_cfg_path, "w"))

        # --- reference side, exactly as photos.py --recompute-average does
        sys.path.insert(0, REFERENCE)
        try:
            from config.percentile_normalizer import (
                PercentileNormalizer as RefNorm,
            )
            from processing.scorer import Facet as RefFacet
            from processing.scorer import process_bursts as ref_bursts
            scorer = RefFacet(db_path=ref_db, config_path=ref_cfg_path,
                              lightweight=True)
            norm_settings = scorer.config.get_normalization_settings()
            normalizer = None
            if norm_settings.get("method") == "percentile":
                normalizer = RefNorm(
                    ref_db,
                    target_percentile=norm_settings.get(
                        "percentile_target", 95),
                    per_category=norm_settings.get("per_category", False),
                    category_min_samples=norm_settings.get(
                        "category_min_samples", 50))
                normalizer.compute_percentiles()
            scorer.update_all_aggregates(use_embeddings=True,
                                         normalizer=normalizer)
            ref_bursts(ref_db, ref_cfg_path)
        finally:
            sys.path.remove(REFERENCE)

        # --- our side
        from facet_tpu.processing.scorer import Facet
        from facet_tpu.utils.burst import process_bursts as our_bursts

        ours = Facet(db_path=our_db, config_path=our_cfg_path,
                     lightweight=True)
        ours.update_all_aggregates()
        our_bursts(our_db, ours.config)

        def read(path):
            conn = sqlite3.connect(path)
            conn.row_factory = sqlite3.Row
            rows = {r["path"]: dict(r) for r in conn.execute(
                "SELECT * FROM photos")}
            conn.close()
            return rows

        return read(ref_db), read(our_db)

    def test_aggregates_and_categories_match(self, recomputed):
        ref_rows, our_rows = recomputed
        assert set(ref_rows) == set(our_rows)
        for path in ref_rows:
            r, o = ref_rows[path], our_rows[path]
            assert o["category"] == r["category"], path
            assert o["aggregate"] == pytest.approx(r["aggregate"],
                                                   abs=1e-6), path

    def test_refreshed_scores_match(self, recomputed):
        ref_rows, our_rows = recomputed
        for path in ref_rows:
            r, o = ref_rows[path], our_rows[path]
            for col in ("tech_sharpness", "color_score", "eye_sharpness",
                        "exposure_score", "shadow_clipped",
                        "highlight_clipped", "is_group_portrait"):
                if r[col] is None:
                    assert o[col] is None, (path, col)
                else:
                    assert o[col] == pytest.approx(r[col], abs=1e-6), (
                        path, col)

    def test_burst_grouping_matches(self, recomputed):
        """Bursts surface only through is_burst_lead (no group column in
        either schema): every lead/member decision must agree."""
        ref_rows, our_rows = recomputed
        ref_leads = {p for p, r in ref_rows.items() if r["is_burst_lead"]}
        our_leads = {p for p, r in our_rows.items() if r["is_burst_lead"]}
        assert our_leads == ref_leads
        # the fixture must actually produce burst members (non-leads)
        assert len(ref_leads) < len(ref_rows)


class TestValidatorParity:
    """Both validators must flag the same injected corruptions on the same
    database (schema CHECK constraints block some corruption classes at
    write time — those are covered by the constraints themselves)."""

    def test_same_corruptions_flagged(self, ref, tmp_path):
        import sqlite3

        db = str(tmp_path / "val.db")
        _seed_recompute_db(db, n=40)
        conn = sqlite3.connect(db)
        conn.execute("UPDATE photos SET face_count = 3, face_quality = NULL"
                     " WHERE path = '/photos/r001.jpg'")
        conn.execute("UPDATE photos SET histogram_data = x'00112233'"
                     " WHERE path = '/photos/r003.jpg'")
        conn.execute("UPDATE photos SET clip_embedding = x'0011'"
                     " WHERE path = '/photos/r004.jpg'")
        conn.execute("UPDATE photos SET is_monochrome = 1,"
                     " mean_saturation = 0.85 WHERE path = '/photos/r006.jpg'")
        conn.execute("UPDATE photos SET composition_pattern ="
                     " 'zigzag_nonsense' WHERE path = '/photos/r007.jpg'")
        conn.execute("INSERT INTO faces (photo_path, face_index, embedding,"
                     " person_id) VALUES ('/photos/missing.jpg', 0, x'00',"
                     " 999)")
        conn.commit()
        conn.close()

        sys.path.insert(0, REFERENCE)
        try:
            from validation.database_validator import (
                DatabaseValidator as RefValidator,
            )
            ref_found = {r.check_name: len(r.issues)
                         for r in RefValidator(db).run_all_checks()
                         if r.issues and not r.informational}
        finally:
            sys.path.remove(REFERENCE)

        from facet_tpu.validation.database_validator import DatabaseValidator

        our_found = {r.name: r.issues
                     for r in DatabaseValidator(db).run_all_checks()
                     if not r.passed}

        # corruption class -> (reference check names, our check name)
        mapping = [
            (("histogram_blob_size",), "histogram_integrity"),
            (("clip_embedding_size",), "embedding_dims"),
            (("orphaned_faces",), "referential_integrity"),
            (("monochrome_saturation",), "monochrome_consistency"),
            (("composition_pattern_invalid",), "pattern_vocabulary"),
            (("face_metrics_when_no_face", "blink_without_face",
              "face_count_mismatch"), "face_consistency"),
        ]
        for ref_names, our_name in mapping:
            ref_count = sum(ref_found.get(n, 0) for n in ref_names)
            assert ref_count > 0, ref_names
            assert our_found.get(our_name, 0) > 0, our_name
        # same monochrome threshold: identical counts
        assert our_found["monochrome_consistency"] == ref_found[
            "monochrome_saturation"]
        # identical face-consistency totals across the three sub-checks
        assert our_found["face_consistency"] == sum(
            ref_found.get(n, 0) for n in ("face_metrics_when_no_face",
                                          "blink_without_face",
                                          "face_count_mismatch"))


class TestComparisonParity:
    """Pair selection + vote statistics vs the reference's comparison
    subsystem on identical seeded databases."""

    def _seed(self, path):
        _seed_recompute_db(path, n=60, seed=21)

    def test_uncertainty_strategy_picks_identical_pairs(self, ref, tmp_path):
        import sqlite3

        ref_db = str(tmp_path / "ref.db")
        our_db = str(tmp_path / "our.db")
        self._seed(ref_db)
        self._seed(our_db)

        sys.path.insert(0, REFERENCE)
        try:
            from comparison.pair_selector import PairSelector as RefSel
            ref_sel = RefSel(ref_db)
            from facet_tpu.comparison.pair_selector import PairSelector

            our_sel = PairSelector(our_db, strategy="uncertainty", seed=0)
            for step in range(4):
                want = ref_sel.get_next_pair(strategy="uncertainty")
                got = our_sel.next_pair()
                assert (want is None) == (got is None), step
                if want is None:
                    break
                assert {want["a"], want["b"]} == set(got), step
                # record the vote in BOTH databases so the exclusion path
                # drives the next selection identically
                for db in (ref_db, our_db):
                    conn = sqlite3.connect(db)
                    conn.execute(
                        "INSERT INTO comparisons (photo_a_path, photo_b_path,"
                        " winner) VALUES (?, ?, 'a')",
                        tuple(sorted((want["a"], want["b"]))))
                    conn.commit()
                    conn.close()
        finally:
            sys.path.remove(REFERENCE)

    def test_boundary_strategy_invariants_match(self, ref, tmp_path):
        ref_db = str(tmp_path / "ref.db")
        our_db = str(tmp_path / "our.db")
        self._seed(ref_db)
        self._seed(our_db)

        sys.path.insert(0, REFERENCE)
        try:
            from comparison.pair_selector import PairSelector as RefSel
            want = RefSel(ref_db).get_next_pair(strategy="boundary")
        finally:
            sys.path.remove(REFERENCE)
        from facet_tpu.comparison.pair_selector import PairSelector

        got = PairSelector(our_db, strategy="boundary", seed=1).next_pair()
        # both strategies are randomized; the contract is the score band
        assert want is not None and got is not None
        assert 5.5 <= want["score_a"] <= 8.5
        assert 5.5 <= want["score_b"] <= 8.5
        import sqlite3

        conn = sqlite3.connect(our_db)
        scores = {p: s for p, s in conn.execute(
            "SELECT path, aggregate FROM photos")}
        conn.close()
        assert all(5.5 <= scores[p] <= 8.5 for p in got)

    def test_vote_statistics_match(self, ref, tmp_path):
        """Identical votes through both managers produce identical totals,
        winner tallies and unique-photo counts."""
        ref_db = str(tmp_path / "ref.db")
        our_db = str(tmp_path / "our.db")
        self._seed(ref_db)
        self._seed(our_db)
        votes = [("/photos/r000.jpg", "/photos/r001.jpg", "a"),
                 ("/photos/r002.jpg", "/photos/r003.jpg", "b"),
                 ("/photos/r004.jpg", "/photos/r005.jpg", "tie"),
                 ("/photos/r006.jpg", "/photos/r007.jpg", "skip"),
                 ("/photos/r000.jpg", "/photos/r002.jpg", "a")]

        sys.path.insert(0, REFERENCE)
        try:
            from comparison.comparison_manager import (
                ComparisonManager as RefMgr,
            )
            rm = RefMgr(ref_db)
            for a, b, w in votes:
                rm.submit_comparison(a, b, w)
            want = rm.get_statistics()
        finally:
            sys.path.remove(REFERENCE)

        from facet_tpu.comparison.manager import ComparisonManager

        om = ComparisonManager(our_db)
        for a, b, w in votes:
            om.submit(a, b, w)
        got = om.statistics()

        # our count() excludes skips exactly like the reference's total
        assert got["comparisons"] == want["total_comparisons"]
        for key in ("a", "b", "tie", "skip"):
            assert got["by_winner"].get(key, 0) == \
                want["winner_breakdown"].get(key, 0), key
        assert got["compared_photos"] == want["unique_photos_compared"]


class TestLearnedScoresParity:
    def test_bradley_terry_scores_match(self, ref, pinned_configs, tmp_path):
        """compute_learned_scores: identical votes -> identical 0-10
        Bradley-Terry strengths in learned_scores (the reference sweeps
        in-place, we update vectorized — same fixed point)."""
        import sqlite3

        ref_db = str(tmp_path / "ref.db")
        our_db = str(tmp_path / "our.db")
        _seed_recompute_db(ref_db, n=30, seed=33)
        _seed_recompute_db(our_db, n=30, seed=33)
        rng = np.random.default_rng(4)
        votes, seen = [], set()
        while len(votes) < 120:
            a, b = rng.choice(30, 2, replace=False)
            if (a, b) in seen:
                continue
            seen.add((a, b))
            votes.append((f"/photos/r{a:03d}.jpg", f"/photos/r{b:03d}.jpg",
                          str(rng.choice(["a", "b"]))))
        for db in (ref_db, our_db):
            conn = sqlite3.connect(db)
            conn.executemany(
                "INSERT INTO comparisons (photo_a_path, photo_b_path,"
                " winner) VALUES (?, ?, ?)", votes)
            conn.commit()
            conn.close()

        sys.path.insert(0, REFERENCE)
        try:
            from optimization.weight_optimizer import (
                WeightOptimizer as RefOpt,
            )
            ref_cfg_path = pinned_configs[0].config_path
            out = RefOpt(ref_db, ref_cfg_path).compute_learned_scores()
            assert out["photos_updated"] > 0
        finally:
            sys.path.remove(REFERENCE)

        from facet_tpu.optimization.weight_optimizer import WeightOptimizer

        ours = WeightOptimizer(our_db, pinned_configs[1])
        mine = ours.compute_learned_scores()
        assert mine["photos_updated"] == out["photos_updated"]

        def read(path):
            conn = sqlite3.connect(path)
            rows = dict(conn.execute(
                "SELECT photo_path, learned_score FROM learned_scores"))
            conn.close()
            return rows

        want, got = read(ref_db), read(our_db)
        assert set(want) == set(got)
        for p in want:
            assert got[p] == pytest.approx(want[p], abs=1e-3), p


class TestTopPicksParity:
    """Our top-picks SQL must score rows identically to the reference's
    get_top_picks_score_sql (api/top_picks.py:9-41), loaded with its
    api.config dependency stubbed (fastapi is not installed here)."""

    def _reference_sql(self, photo_types):
        import importlib.util
        import types

        fake_api = types.ModuleType("api")
        fake_cfg = types.ModuleType("api.config")
        fake_cfg.VIEWER_CONFIG = {"photo_types": photo_types}
        saved = {k: sys.modules.get(k) for k in ("api", "api.config")}
        sys.modules["api"] = fake_api
        sys.modules["api.config"] = fake_cfg
        try:
            spec = importlib.util.spec_from_file_location(
                "ref_top_picks", os.path.join(REFERENCE, "api", "top_picks.py"))
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod.get_top_picks_score_sql()
        finally:
            for key, val in saved.items():
                if val is None:
                    sys.modules.pop(key, None)
                else:
                    sys.modules[key] = val

    @pytest.mark.parametrize("photo_types", [
        {},
        {"top_picks_weights": {"aggregate_percent": 40,
                               "aesthetic_percent": 30,
                               "composition_percent": 20,
                               "face_quality_percent": 10},
         "top_picks_min_face_ratio": 0.1},
        # odd face percent: the derived no-face weights are 3-decimal and
        # the reference's {:.2f} rendering rounds them — we must match
        {"top_picks_weights": {"aggregate_percent": 20,
                               "aesthetic_percent": 31,
                               "composition_percent": 24,
                               "face_quality_percent": 25}},
        # fractional percents: derivation must happen BEFORE rounding
        # (0.245 + 0.125 = 0.37, not round(0.245)=0.25 -> 0.38)
        {"top_picks_weights": {"aggregate_percent": 26,
                               "aesthetic_percent": 24.5,
                               "composition_percent": 24.5,
                               "face_quality_percent": 25}},
    ])
    def test_scores_match_reference_sql(self, photo_types, tmp_path):
        import sqlite3

        from facet_tpu.api.top_picks import top_picks_score_sql

        ref_sql = self._reference_sql(photo_types)
        our_sql = top_picks_score_sql({"photo_types": photo_types})

        conn = sqlite3.connect(":memory:")
        conn.execute(
            "CREATE TABLE photos (aggregate REAL, aesthetic REAL,"
            " comp_score REAL, face_quality REAL, face_ratio REAL)")
        rng = np.random.default_rng(4)
        rows = []
        for _ in range(200):
            row = [round(float(v), 2) for v in rng.uniform(0, 10, 4)]
            row.append(round(float(rng.uniform(0, 0.5)), 3))
            # sprinkle NULLs like real mid-scan rows
            for j in range(5):
                if rng.random() < 0.15:
                    row[j] = None
            rows.append(tuple(row))
        conn.executemany("INSERT INTO photos VALUES (?, ?, ?, ?, ?)", rows)

        want = [r[0] for r in conn.execute(
            f"SELECT {ref_sql} FROM photos")]
        got = [r[0] for r in conn.execute(
            f"SELECT {our_sql.replace('p.', '')} FROM photos")]
        np.testing.assert_allclose(got, want, atol=1e-9)


class TestExifParseParity:
    """Our exiftool-record standardization must agree with the
    reference's parse_exif_data (exiftool/exiftool_batch.py:178-210)
    on every shared field."""

    def test_fields_match(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_exif", os.path.join(REFERENCE, "exiftool",
                                     "exiftool_batch.py"))
        ref_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_mod)

        from facet_tpu.utils.exif import _standardize_exiftool

        records = [
            {"DateTimeOriginal": "2026:05:01 10:00:00", "Model": "CamX",
             "LensModel": "50mm f/1.8", "ISO": 400, "Aperture": 2.8,
             "ExposureTime": 0.004, "FocalLength": 50.0,
             "FocalLengthIn35mmFormat": 75.0},
            # CreateDate fallback, LensID fallback, string numerics
            # (f_stop: the reference reads only the Aperture composite;
            # our FNumber fallback is a strict-superset extension, so the
            # shared record uses Aperture)
            {"CreateDate": "2026:05:02 11:00:00", "Model": "CamY",
             "LensID": "Zoom 24-70", "ISO": "1600", "Aperture": "4.0",
             "ExposureTime": 2.5, "FocalLength": "24"},
            # empty record
            {},
        ]
        for rec in records:
            want = ref_mod.parse_exif_data(rec)
            got = _standardize_exiftool(rec)
            for field in ("date_taken", "camera_model", "lens_model",
                          "f_stop", "shutter_speed", "focal_length"):
                assert got[field] == want[field], (field, rec, got, want)
            # iso: we store the int form of the same number
            assert (got["iso"] is None) == (want["iso"] is None)
            if want["iso"] is not None:
                assert float(got["iso"]) == want["iso"]
