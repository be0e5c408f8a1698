"""Percentile normalizer, recommendation engine, and weight optimizer tests."""

import numpy as np
import pytest

from facet_tpu.db.connection import get_connection


def seed_scored_library(db_path, n=120, seed=0, aggregate_fn=None):
    rng = np.random.default_rng(seed)
    with get_connection(db_path) as conn:
        for i in range(n):
            agg = aggregate_fn(i, rng) if aggregate_fn else float(
                np.clip(rng.normal(6.0, 1.5), 0, 10))
            conn.execute(
                "INSERT INTO photos (path, aggregate, aesthetic, exposure_score,"
                " tech_sharpness, color_score, comp_score, contrast_score,"
                " category, raw_sharpness_variance, raw_color_entropy,"
                " mean_luminance, histogram_spread, mean_saturation, noise_sigma,"
                " histogram_bimodality, face_count, face_ratio, thumbnail)"
                " VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, 0,"
                " 0.0, x'FFD8')",
                (f"/lib/p{i:03d}.jpg", agg,
                 float(np.clip(rng.normal(6, 1.2), 0, 10)),
                 float(np.clip(rng.normal(7, 1), 0, 10)),
                 float(np.clip(rng.normal(6, 2), 0, 10)),
                 float(np.clip(rng.normal(6, 1), 0, 10)),
                 float(np.clip(rng.normal(6, 1), 0, 10)),
                 float(np.clip(rng.normal(7, 1), 0, 10)),
                 "landscape" if i % 2 else "default",
                 float(rng.uniform(50, 3000)),
                 float(rng.uniform(5, 15)),
                 0.5, 50.0, 0.4, 2.0, 0.5))
    return db_path


class TestPercentiles:
    def test_global_and_per_category(self, tmp_db, scoring_config):
        from facet_tpu.config.percentile_normalizer import PercentileNormalizer

        seed_scored_library(tmp_db)
        norm = PercentileNormalizer(tmp_db, scoring_config)
        p = norm.compute_percentiles()
        assert "raw_sharpness_variance" in p
        assert 50 <= p["raw_sharpness_variance"] <= 3000
        norm.compute_percentiles_per_category()
        assert "landscape" in norm._by_category

        # normalization maps the percentile value to 10, capped
        val = norm.normalize("raw_sharpness_variance",
                             p["raw_sharpness_variance"])
        assert val == pytest.approx(10.0)
        assert norm.normalize("raw_sharpness_variance",
                              p["raw_sharpness_variance"] * 2) == 10.0
        assert norm.normalize("raw_sharpness_variance", None) is None

    def test_recompute_applies_normalization(self, tmp_db, scoring_config):
        """Reference semantics (parity-tested against the real reference in
        test_reference_parity.py): normalization feeds the aggregate
        TRANSIENTLY — stored metric scores stay untouched while aggregates
        shift with the library percentiles."""
        from facet_tpu.processing.scorer import Facet

        seed_scored_library(tmp_db, n=60)
        with get_connection(tmp_db) as conn:
            before = {r[0]: (r[1], r[2]) for r in conn.execute(
                "SELECT path, tech_sharpness, aggregate FROM photos")}
        scorer = Facet(tmp_db, scoring_config, lightweight=True)
        scorer.update_all_aggregates(rescore_embeddings=False)
        with get_connection(tmp_db) as conn:
            after = {r[0]: (r[1], r[2]) for r in conn.execute(
                "SELECT path, tech_sharpness, aggregate FROM photos")}
        # stored tech_sharpness unchanged (never persisted by recompute)
        assert all(after[p][0] == before[p][0] for p in before)
        # but aggregates were recomputed (normalization + brain applied)
        changed = sum(1 for p in before if after[p][1] != before[p][1])
        assert changed > len(before) * 0.5


class TestRecommendations:
    def test_dominant_metric_detected(self, tmp_db, scoring_config):
        from facet_tpu.config.percentile_normalizer import PercentileNormalizer

        rng = np.random.default_rng(1)
        # aggregate == contrast_score: a LOW-weight metric (8%) perfectly
        # driving the aggregate — way above its variance-aware expectation
        with get_connection(tmp_db) as conn:
            for i in range(80):
                val = float(np.clip(rng.normal(6, 2), 0, 10))
                conn.execute(
                    "INSERT INTO photos (path, aggregate, contrast_score,"
                    " aesthetic, exposure_score, category)"
                    " VALUES (?, ?, ?, 6.0, 6.0, 'default')",
                    (f"/d/p{i}.jpg", val, val))
        norm = PercentileNormalizer(tmp_db, scoring_config)
        issues = norm.analyze_scoring_issues()
        doms = [i for i in issues if i["issue_type"] == "dominant_metric"]
        assert doms
        assert any(i["target_key"] == "contrast_percent" for i in doms)
        # a metric at its expected correlation is NOT flagged: aesthetic at
        # 30% weight with constant value has no correlation at all
        assert not any(i["target_key"] == "aesthetic_percent" for i in doms)
        for dom in doms:
            # damped: at most 3 points of change
            assert abs(dom["proposed_value"] - dom["old_value"]) <= 3

    def test_spearman_and_expected_correlation(self):
        from facet_tpu.config.percentile_normalizer import PercentileNormalizer

        # monotonic but nonlinear: Spearman = 1, Pearson < 1
        xs = list(range(1, 40))
        ys = [x ** 3 for x in xs]
        s = PercentileNormalizer._spearman(xs, ys)
        p = PercentileNormalizer._correlation(xs, ys)
        assert s == pytest.approx(1.0)
        assert p < 0.95
        # ties get average ranks
        assert PercentileNormalizer._spearman(
            [1, 1, 2, 3], [1, 1, 2, 3]) == pytest.approx(1.0)
        # expected correlation scales with weight and std ratio, capped
        e = PercentileNormalizer.expected_correlation(0.1, 8, 1.0, 2.0)
        assert 0 < e < 0.5
        assert PercentileNormalizer.expected_correlation(0.9, 8, 2.0, 1.0) == 0.95

    def test_low_correlation_dead_weight(self, tmp_db, scoring_config):
        from facet_tpu.config.percentile_normalizer import PercentileNormalizer

        rng = np.random.default_rng(3)
        # aesthetic holds 30% weight but is pure noise vs the aggregate
        with get_connection(tmp_db) as conn:
            for i in range(150):
                agg = float(np.clip(rng.normal(6, 1.5), 0, 10))
                noise = float(np.clip(rng.normal(5, 2), 0, 10))
                conn.execute(
                    "INSERT INTO photos (path, aggregate, aesthetic, category)"
                    " VALUES (?, ?, ?, 'default')",
                    (f"/d/p{i}.jpg", agg, noise))
        norm = PercentileNormalizer(tmp_db, scoring_config)
        issues = norm.analyze_scoring_issues()
        low = [i for i in issues if i["issue_type"] == "low_correlation"]
        assert any(i["target_key"] == "aesthetic_percent" for i in low)

    def test_underutilized_quality_signal(self, tmp_db, scoring_config):
        from facet_tpu.config.percentile_normalizer import PercentileNormalizer

        rng = np.random.default_rng(4)
        with get_connection(tmp_db) as conn:
            for i in range(60):
                agg = float(np.clip(rng.normal(6, 1.5), 0, 10))
                conn.execute(
                    "INSERT INTO photos (path, aggregate, quality_score,"
                    " category) VALUES (?, ?, ?, 'default')",
                    (f"/d/p{i}.jpg", agg, float(np.clip(rng.normal(8.5, 0.5),
                                                        0, 10))))
        norm = PercentileNormalizer(tmp_db, scoring_config)
        issues = norm.analyze_scoring_issues()
        under = [i for i in issues
                 if i["issue_type"] == "underutilized_signal"]
        assert under and under[0]["target_key"] == "quality_percent"
        assert under[0]["proposed_value"] - under[0]["old_value"] <= 3

    def test_per_category_targeting(self, tmp_db, scoring_config):
        from facet_tpu.config.percentile_normalizer import PercentileNormalizer

        rng = np.random.default_rng(5)
        with get_connection(tmp_db) as conn:
            # portrait: contrast (low weight there too) drives the aggregate
            for i in range(60):
                val = float(np.clip(rng.normal(6, 2), 0, 10))
                conn.execute(
                    "INSERT INTO photos (path, aggregate, contrast_score,"
                    " category) VALUES (?, ?, ?, 'portrait')",
                    (f"/d/port{i}.jpg", val, val))
            # landscape: healthy noise
            for i in range(60):
                conn.execute(
                    "INSERT INTO photos (path, aggregate, contrast_score,"
                    " category) VALUES (?, ?, ?, 'landscape')",
                    (f"/d/land{i}.jpg",
                     float(np.clip(rng.normal(6, 1.5), 0, 10)),
                     float(np.clip(rng.normal(5, 2), 0, 10))))
        norm = PercentileNormalizer(tmp_db, scoring_config)
        norm.min_samples = 50
        issues = norm.analyze_scoring_issues()
        targeted = [i for i in issues
                    if i["issue_type"] == "dominant_metric"
                    and i["target_category"] == "portrait"]
        assert targeted, "per-category dominance must target that category"
        assert not any(i["target_category"] == "landscape" for i in issues
                       if i["issue_type"] == "dominant_metric")

    def test_health_and_apply_and_oscillation(self, tmp_db, scoring_config):
        from facet_tpu.config.percentile_normalizer import PercentileNormalizer

        seed_scored_library(tmp_db, aggregate_fn=lambda i, rng: 7.0)  # zero std
        norm = PercentileNormalizer(tmp_db, scoring_config)
        report = norm.health_report()
        assert report["health_score"] < 100
        clustering = [i for i in report["issues"]
                      if i["issue_type"] == "score_clustering"]
        assert clustering

        applied = norm.apply_recommendations(clustering)
        assert applied == 1
        # the weight moved in the config; small targeted changes stay within
        # the +-5% normalization tolerance (preserved, not renormalized)
        w = scoring_config.get_category_config("default")["weights"]
        assert w["aesthetic_percent"] == clustering[0]["proposed_value"]
        total = sum(v for k, v in w.items() if k.endswith("_percent"))
        assert 100 <= total <= 105

        # proposing the exact reverse now must be suppressed as oscillation
        reverse = dict(clustering[0])
        reverse["old_value"], reverse["proposed_value"] = (
            clustering[0]["proposed_value"], clustering[0]["old_value"])
        assert norm._oscillates(reverse)

    def test_simulation_shape(self, tmp_db, scoring_config):
        from facet_tpu.config.percentile_normalizer import PercentileNormalizer

        seed_scored_library(tmp_db, n=40)
        norm = PercentileNormalizer(tmp_db, scoring_config)
        out = norm.simulate_recommendations([{
            "issue_type": "x", "target_category": "default",
            "target_key": "aesthetic_percent", "old_value": 30,
            "proposed_value": 33, "priority": 1}])
        assert out["photos"] == 40
        assert "mean_after" in out


class TestBatchTuner:
    def test_bottleneck_directions(self):
        from facet_tpu.config.percentile_normalizer import recalculate_batch_settings

        io_bound = recalculate_batch_settings(50, 40, device_imgs_per_sec=150,
                                              current_workers=4)
        assert io_bound["bottleneck"] == "io" and io_bound["workers"] == 6
        dev_bound = recalculate_batch_settings(900, 400, device_imgs_per_sec=150,
                                               current_workers=4)
        assert dev_bound["bottleneck"] == "device" and dev_bound["workers"] == 3
        balanced = recalculate_batch_settings(300, 150, device_imgs_per_sec=150,
                                              current_workers=4)
        assert balanced["bottleneck"] == "balanced"


class TestWeightOptimizer:
    def test_learns_preference_direction(self, tmp_db, scoring_config):
        """Votes that always prefer higher aesthetic should push weight there."""
        from facet_tpu.optimization.weight_optimizer import WeightOptimizer

        rng = np.random.default_rng(2)
        paths = []
        with get_connection(tmp_db) as conn:
            for i in range(40):
                aes = float(rng.uniform(1, 9))
                comp = float(rng.uniform(1, 9))
                path = f"/o/p{i}.jpg"
                paths.append((path, aes))
                conn.execute(
                    "INSERT INTO photos (path, aggregate, aesthetic, comp_score,"
                    " exposure_score, tech_sharpness, color_score,"
                    " contrast_score, category, mean_luminance, thumbnail)"
                    " VALUES (?, 5.0, ?, ?, 5.0, 5.0, 5.0, 5.0, 'default',"
                    " 0.5, x'FFD8')",
                    (path, aes, comp))
            # 60 votes, winner = higher aesthetic
            for _ in range(60):
                a, b = rng.choice(len(paths), 2, replace=False)
                winner = "a" if paths[a][1] > paths[b][1] else "b"
                conn.execute(
                    "INSERT OR IGNORE INTO comparisons (photo_a_path,"
                    " photo_b_path, winner) VALUES (?, ?, ?)",
                    (paths[a][0], paths[b][0], winner))

        optimizer = WeightOptimizer(tmp_db, scoring_config)
        result = optimizer.optimize(min_comparisons=20)
        assert result is not None
        assert result["accuracy_after"] >= result["accuracy_before"]
        assert result["accuracy_after"] >= 0.9  # aesthetic fully explains votes
        assert result["new_weights"]["aesthetic"] > result["old_weights"]["aesthetic"]
        # constraint respected
        total = sum(result["new_weights"].values())
        assert total == pytest.approx(1.0, abs=0.01)
        assert max(result["new_weights"].values()) <= 0.6 + 1e-4

    def test_apply_snapshots(self, tmp_db, scoring_config):
        from facet_tpu.optimization.weight_optimizer import WeightOptimizer

        optimizer = WeightOptimizer(tmp_db, scoring_config)
        fake = {
            "category": "default", "comparisons_used": 30,
            "old_weights": {"aesthetic": 0.3},
            "new_weights": {"aesthetic": 0.5, "composition": 0.3,
                            "exposure": 0.2},
            "accuracy_before": 0.6, "accuracy_after": 0.8,
        }
        optimizer.apply_optimized_weights(fake)
        with get_connection(tmp_db) as conn:
            snaps = conn.execute(
                "SELECT COUNT(*) FROM weight_config_snapshots").fetchone()[0]
            runs = conn.execute(
                "SELECT COUNT(*) FROM weight_optimization_runs").fetchone()[0]
        assert snaps == 1 and runs == 1
        w = scoring_config.get_category_config("default")["weights"]
        assert sum(v for k, v in w.items() if k.endswith("_percent")) == 100


class TestRound4ReviewFixes:
    def test_orphaned_comparison_does_not_crash(self, tmp_db, scoring_config):
        """A vote whose photo row was deleted (migrated DB / FKs off) must
        be skipped, not KeyError the whole optimization."""
        from facet_tpu.optimization.weight_optimizer import WeightOptimizer

        rng = np.random.default_rng(5)
        with get_connection(tmp_db) as conn:
            conn.execute("PRAGMA foreign_keys=OFF")
            paths = []
            for i in range(30):
                path = f"/o2/p{i}.jpg"
                paths.append(path)
                conn.execute(
                    "INSERT INTO photos (path, aggregate, aesthetic,"
                    " comp_score, exposure_score, tech_sharpness,"
                    " color_score, contrast_score, category,"
                    " mean_luminance) VALUES (?, 5.0, ?, 5.0, 5.0, 5.0,"
                    " 5.0, 5.0, 'default', 0.5)",
                    (path, float(rng.uniform(1, 9))))
            for i in range(25):
                conn.execute(
                    "INSERT OR IGNORE INTO comparisons (photo_a_path,"
                    " photo_b_path, winner) VALUES (?, ?, 'a')",
                    (paths[i], paths[i + 1]))
            # the orphan: references a photo that is not in the table
            conn.execute(
                "INSERT INTO comparisons (photo_a_path, photo_b_path,"
                " winner) VALUES (?, '/o2/deleted.jpg', 'a')", (paths[0],))

        optimizer = WeightOptimizer(tmp_db, scoring_config)
        result = optimizer.optimize(min_comparisons=10)
        assert result is not None
        assert result["comparisons_used"] == 25   # orphan skipped

    def test_learned_weights_restricted_to_config_vocabulary(
            self, tmp_db, scoring_config):
        """Training is masked to the 12 VALID_WEIGHT_COLUMNS so the
        reported accuracy describes the vector apply can persist (the
        reference trains 16 and its config validation then strips 4)."""
        from facet_tpu.config.category_filter import VALID_WEIGHT_COLUMNS
        from facet_tpu.optimization.weight_optimizer import WeightOptimizer

        rng = np.random.default_rng(6)
        with get_connection(tmp_db) as conn:
            paths = []
            for i in range(30):
                path = f"/o3/p{i}.jpg"
                paths.append((path, float(rng.uniform(1, 9))))
                conn.execute(
                    "INSERT INTO photos (path, aggregate, aesthetic,"
                    " comp_score, exposure_score, tech_sharpness,"
                    " color_score, contrast_score, category,"
                    " mean_luminance, face_sharpness, power_point_score,"
                    " mean_saturation, noise_sigma) VALUES (?, 5.0, ?, 5.0,"
                    " 5.0, 5.0, 5.0, 5.0, 'default', 0.5, ?, ?, ?, ?)",
                    (path, paths[-1][1], float(rng.uniform(1, 9)),
                     float(rng.uniform(1, 9)), float(rng.uniform(0, 1)),
                     float(rng.uniform(0, 10))))
            for _ in range(40):
                a, b = rng.choice(len(paths), 2, replace=False)
                winner = "a" if paths[a][1] > paths[b][1] else "b"
                conn.execute(
                    "INSERT OR IGNORE INTO comparisons (photo_a_path,"
                    " photo_b_path, winner) VALUES (?, ?, ?)",
                    (paths[a][0], paths[b][0], winner))

        optimizer = WeightOptimizer(tmp_db, scoring_config)
        result = optimizer.optimize(min_comparisons=10)
        assert result is not None
        for key, val in result["new_weights"].items():
            if key not in VALID_WEIGHT_COLUMNS:
                assert val == 0.0, (key, val)
        applicable = sum(v for k, v in result["new_weights"].items()
                         if k in VALID_WEIGHT_COLUMNS)
        assert applicable == pytest.approx(1.0, abs=0.01)

    def test_simulate_survives_target_key_none(self, tmp_db, scoring_config):
        """category_imbalance issues carry target_key=None; simulate must
        filter them out, not AttributeError."""
        from facet_tpu.config.percentile_normalizer import PercentileNormalizer

        with get_connection(tmp_db) as conn:
            for i in range(12):
                conn.execute(
                    "INSERT INTO photos (path, aggregate, aesthetic,"
                    " category, mean_luminance) VALUES (?, 5.0, 5.0,"
                    " 'default', 0.5)", (f"/s/p{i}.jpg",))
        norm = PercentileNormalizer(tmp_db, scoring_config)
        out = norm.simulate_recommendations(issues=[{
            "issue_type": "category_imbalance", "target_category": None,
            "target_key": None, "old_value": None, "proposed_value": None,
            "priority": 4}])
        assert isinstance(out, dict)   # no AttributeError; shape is pinned
        assert not out.get("changes", [])  # the None-key issue is filtered
