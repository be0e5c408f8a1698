"""Aggregate scoring tests: scalar brain semantics + vectorized parity."""

import numpy as np
import pytest

from facet_tpu.scoring import (
    AggregateScorer,
    calculate_aggregate,
    parse_shutter_speed,
    safe_float,
)


def base_metrics(**overrides):
    m = {
        "aesthetic": 6.0, "exposure_score": 7.0, "color_score": 6.5,
        "comp_score": 6.0, "contrast_score": 7.0, "tech_sharpness": 8.0,
        "face_quality": 7.0, "eye_sharpness": 6.0, "face_sharpness": 6.5,
        "power_point_score": 5.0, "mean_saturation": 0.45, "noise_sigma": 2.0,
        "histogram_bimodality": 0.5, "histogram_spread": 50.0,
        "leading_lines_score": 3.0, "is_monochrome": 0, "is_silhouette": 0,
        "is_group_portrait": 0, "is_blink": 0, "shadow_clipped": 0,
        "highlight_clipped": 0, "face_count": 0, "face_ratio": 0.0,
        "mean_luminance": 0.5, "tags": "", "iso": 200, "f_stop": 5.6,
        "isolation_bonus": 1.0,
    }
    m.update(overrides)
    return m


class TestSafeFloat:
    def test_sanitizes(self):
        assert safe_float(None) == 5.0
        assert safe_float(b"\x00\x01") == 5.0
        assert safe_float("3.5") == 3.5
        assert safe_float("junk", 2.0) == 2.0
        assert safe_float(1e6) == 5.0  # absurd values rejected
        assert safe_float(-7.0, 0) == -7.0


class TestShutterParse:
    def test_forms(self):
        assert parse_shutter_speed("1/500") == pytest.approx(0.002)
        assert parse_shutter_speed(2.5) == 2.5
        assert parse_shutter_speed("30") == 30.0
        assert parse_shutter_speed("bad") is None
        assert parse_shutter_speed(None) is None


class TestBrain:
    def test_score_in_range_and_category(self, scoring_config):
        score, cat = calculate_aggregate(base_metrics(), scoring_config)
        assert 0.0 <= score <= 10.0
        assert cat == "default"

    def test_blink_halves_portrait_score(self, scoring_config):
        m = base_metrics(face_count=1, face_ratio=0.3)
        open_eyes, cat = calculate_aggregate(m, scoring_config)
        assert cat == "portrait"
        blink, _ = calculate_aggregate(base_metrics(face_count=1, face_ratio=0.3,
                                                    is_blink=1), scoring_config)
        # blink multiplies weighted sum by 0.5 before bonus
        assert blink < open_eyes
        assert blink == pytest.approx((open_eyes - 0.5) * 0.5 + 0.5, abs=1e-6)

    def test_iso_sharpness_compensation(self, scoring_config):
        lo, _ = calculate_aggregate(base_metrics(tech_sharpness=5.0, iso=800),
                                    scoring_config)
        hi, _ = calculate_aggregate(base_metrics(tech_sharpness=5.0, iso=3200),
                                    scoring_config)
        assert hi > lo  # +0.5*log2(4) = +1 on the sharpness input

    def test_reference_iso_parity_flag(self, scoring_config):
        """exif_adjustments.reference_iso_parity reproduces the reference's
        effective (no-op) ISO compensation — the one documented divergence
        from reference aggregates, exempted from parity via this flag."""
        scoring_config.config.setdefault("exif_adjustments", {})[
            "reference_iso_parity"] = True
        lo, _ = calculate_aggregate(base_metrics(tech_sharpness=5.0, iso=800),
                                    scoring_config)
        hi, _ = calculate_aggregate(base_metrics(tech_sharpness=5.0, iso=3200),
                                    scoring_config)
        assert hi == pytest.approx(lo, abs=1e-9)  # boost disabled
        # the vectorized recompute path honors the same flag
        from facet_tpu.scoring.vectorized import AggregateScorer

        scorer = AggregateScorer(scoring_config)
        rows = [dict(base_metrics(tech_sharpness=5.0, iso=iso))
                for iso in (800, 3200)]
        scores, _ = scorer.score_rows(rows)
        assert scores[0] == pytest.approx(scores[1], abs=1e-5)
        scoring_config.config["exif_adjustments"]["reference_iso_parity"] = False

    def test_aperture_isolation_boost(self, scoring_config):
        # default category has isolation weight > 0
        narrow, _ = calculate_aggregate(base_metrics(f_stop=8.0), scoring_config)
        wide, _ = calculate_aggregate(base_metrics(f_stop=1.8), scoring_config)
        assert wide > narrow

    def test_clipping_penalty_and_silhouette_exemption(self, scoring_config):
        clean, _ = calculate_aggregate(base_metrics(), scoring_config)
        clipped, _ = calculate_aggregate(
            base_metrics(shadow_clipped=1, highlight_clipped=1), scoring_config)
        # default category clipping multiplier is 1.5 -> 1.5 * (0.5 + 1.0)
        assert clean - clipped == pytest.approx(2.25, abs=1e-6)

    def test_monochrome_neutral_color(self, scoring_config):
        drab, cat = calculate_aggregate(
            base_metrics(color_score=1.0, is_monochrome=1), scoring_config)
        vivid, cat2 = calculate_aggregate(
            base_metrics(color_score=5.0, is_monochrome=1), scoring_config)
        assert cat == cat2 == "monochrome"
        assert drab == pytest.approx(vivid)  # color forced neutral at 5.0

    def test_noise_penalty_scaled_by_tolerance(self, scoring_config):
        quiet, _ = calculate_aggregate(base_metrics(noise_sigma=4.0), scoring_config)
        noisy, _ = calculate_aggregate(base_metrics(noise_sigma=8.0), scoring_config)
        # noise penalty min(1.5, 4*0.3)=1.2 but noise is ALSO a weighted metric
        # (noise_score drops 0.7/sigma), so just require a strict drop > 1.2
        assert quiet - noisy > 1.2

    def test_astro_skips_clipping(self, scoring_config):
        m = base_metrics(mean_luminance=0.05, shutter_speed=20.0,
                         shadow_clipped=1, highlight_clipped=1)
        clipped, cat = calculate_aggregate(m, scoring_config)
        assert cat == "astro"
        clean, _ = calculate_aggregate(
            base_metrics(mean_luminance=0.05, shutter_speed=20.0), scoring_config)
        assert clipped == pytest.approx(clean)  # exempt


class TestVectorizedParity:
    def test_matches_scalar_on_random_rows(self, scoring_config):
        rng = np.random.default_rng(11)
        rows = []
        for _ in range(300):
            rows.append(base_metrics(
                aesthetic=float(rng.uniform(0, 10)),
                exposure_score=float(rng.uniform(0, 10)),
                color_score=float(rng.uniform(0, 10)),
                comp_score=float(rng.uniform(0, 10)),
                contrast_score=float(rng.uniform(0, 10)),
                tech_sharpness=float(rng.uniform(0, 10)),
                face_quality=float(rng.uniform(0, 10)),
                eye_sharpness=float(rng.uniform(0, 10)),
                face_sharpness=float(rng.uniform(0, 10)),
                power_point_score=float(rng.uniform(0, 10)),
                mean_saturation=float(rng.uniform(0, 1)),
                noise_sigma=float(rng.uniform(0, 15)),
                histogram_bimodality=float(rng.uniform(-2, 4)),
                histogram_spread=float(rng.uniform(0, 90)),
                leading_lines_score=float(rng.uniform(0, 8)),
                is_monochrome=int(rng.random() < 0.2),
                is_silhouette=int(rng.random() < 0.1),
                is_group_portrait=int(rng.random() < 0.1),
                is_blink=int(rng.random() < 0.15),
                shadow_clipped=int(rng.random() < 0.2),
                highlight_clipped=int(rng.random() < 0.2),
                face_count=int(rng.integers(0, 6)),
                face_ratio=float(rng.uniform(0, 0.6)),
                mean_luminance=float(rng.uniform(0, 1)),
                iso=int(rng.choice([100, 200, 800, 1600, 6400])),
                f_stop=float(rng.choice([1.4, 1.8, 2.8, 4.0, 8.0])),
                isolation_bonus=float(rng.uniform(1.0, 2.0)),
                tags=str(rng.choice(["", "animal", "mountain, sky", "food"])),
            ))
        scorer = AggregateScorer(scoring_config)
        vec_scores, vec_cats = scorer.score_rows(rows)
        for i, row in enumerate(rows):
            want, want_cat = calculate_aggregate(row, scoring_config)
            assert vec_cats[i] == want_cat, i
            assert vec_scores[i] == pytest.approx(want, abs=2e-5), (i, row)

    def test_empty(self, scoring_config):
        scores, cats = AggregateScorer(scoring_config).score_rows([])
        assert len(scores) == 0 and cats == []
