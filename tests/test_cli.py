"""CLI-mode tests: the photos.py flag tail dispatches to real subsystems."""

import io
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import photos  # noqa: E402
from facet_tpu.db.connection import get_connection  # noqa: E402


@pytest.fixture
def cli_env(tmp_path, tmp_config, monkeypatch):
    """(db_path, config_path) with a small seeded library."""
    db_path = str(tmp_path / "cli.db")
    from facet_tpu.db.schema import init_database

    init_database(db_path)
    rng = np.random.default_rng(0)
    base = rng.standard_normal(512).astype(np.float32)
    base /= np.linalg.norm(base)
    with get_connection(db_path) as conn:
        for i in range(12):
            conn.execute(
                "INSERT INTO photos (path, filename, aggregate, aesthetic,"
                " comp_score, tech_sharpness, exposure_score, category)"
                " VALUES (?, ?, ?, ?, 6, 7, 6.5, 'default')",
                (f"/cli/p{i}.jpg", f"p{i}.jpg", 4.0 + i * 0.4, 5.0 + i * 0.3))
        # persons 1 and 2 share a near-identical centroid (merge candidates)
        for pid in (1, 2):
            noisy = base + rng.standard_normal(512).astype(np.float32) * 0.01
            conn.execute(
                "INSERT INTO persons (id, name, face_count, centroid)"
                " VALUES (?, ?, 1, ?)", (pid, f"P{pid}", noisy.tobytes()))
        other = rng.standard_normal(512).astype(np.float32)
        conn.execute("INSERT INTO persons (id, name, face_count, centroid)"
                     " VALUES (3, 'P3', 1, ?)", (other.tobytes(),))
    return db_path, tmp_config


def run_cli(args, capsys):
    code = photos.main(args)
    return code, capsys.readouterr().out


class TestCLITail:
    def test_comparison_stats_empty(self, cli_env, capsys):
        db, cfg = cli_env
        code, out = run_cli(["--db", db, "--config", cfg,
                             "--comparison-stats"], capsys)
        assert code == 0
        assert "comparisons: 0" in out

    def test_comparison_stats_with_votes(self, cli_env, capsys):
        db, cfg = cli_env
        from facet_tpu.comparison.manager import ComparisonManager

        manager = ComparisonManager(db)
        manager.submit("/cli/p0.jpg", "/cli/p1.jpg", "b")
        manager.submit("/cli/p2.jpg", "/cli/p3.jpg", "tie")
        code, out = run_cli(["--db", db, "--config", cfg,
                             "--comparison-stats"], capsys)
        assert code == 0
        assert "comparisons: 2" in out
        assert "ties: 1" in out
        assert "agreement" in out

    def test_optimize_weights_insufficient(self, cli_env, capsys):
        db, cfg = cli_env
        code, out = run_cli(["--db", db, "--config", cfg,
                             "--optimize-weights"], capsys)
        assert code == 1
        assert "not enough comparisons" in out

    def test_optimize_weights_runs(self, cli_env, capsys):
        db, cfg = cli_env
        from facet_tpu.comparison.manager import ComparisonManager

        manager = ComparisonManager(db)
        import itertools

        paths = [f"/cli/p{i}.jpg" for i in range(12)]
        for a, b in list(itertools.combinations(paths, 2))[:30]:
            manager.submit(a, b, "b")
        code, out = run_cli(["--db", db, "--config", cfg,
                             "--optimize-weights"], capsys)
        assert code == 0
        assert "agreement:" in out

    def test_suggest_person_merges(self, cli_env, capsys):
        db, cfg = cli_env
        code, out = run_cli(["--db", db, "--config", cfg,
                             "--suggest-person-merges"], capsys)
        assert code == 0
        # persons 1/3 share a centroid and 2/4 share another -> suggestions
        assert "similarity" in out

    def test_fix_thumbnail_rotation(self, tmp_path, tmp_config, capsys):
        db = str(tmp_path / "rot.db")
        from facet_tpu.db.schema import init_database

        init_database(db)
        # a rotated source file: EXIF orientation 6 (90 CW display rotation)
        src = tmp_path / "rotated.jpg"
        img = Image.new("RGB", (60, 40), (200, 30, 30))
        exif = Image.Exif()
        exif[274] = 6
        img.save(src, "JPEG", exif=exif)
        thumb = io.BytesIO()
        img.save(thumb, "JPEG")
        with get_connection(db) as conn:
            conn.execute("INSERT INTO photos (path, thumbnail)"
                         " VALUES (?, ?)", (str(src), thumb.getvalue()))
        code, out = run_cli(["--db", db, "--config", tmp_config,
                             "--fix-thumbnail-rotation"], capsys)
        assert code == 0
        assert "1 fixed" in out
        with get_connection(db) as conn:
            blob = conn.execute("SELECT thumbnail FROM photos").fetchone()[0]
        fixed = Image.open(io.BytesIO(blob))
        assert fixed.size == (40, 60)  # rotated to portrait

    def test_recompute_tags_vlm_unavailable(self, cli_env, capsys):
        db, cfg = cli_env
        code, out = run_cli(["--db", db, "--config", cfg,
                             "--recompute-tags-vlm"], capsys)
        assert code == 0  # graceful: no weights installed in CI
        assert "tagger" in out or "unavailable" in out


class TestRound3Flags:
    """--cluster-faces-incremental-named / --dry-run-count / --verbose
    (reference photos.py:119-120, 144-145, 155-156)."""

    def test_cluster_faces_incremental_named(self, cli_env, capsys):
        db, cfg = cli_env
        rng = np.random.default_rng(7)
        emb = rng.standard_normal(512).astype(np.float32)
        emb /= np.linalg.norm(emb)
        with get_connection(db) as conn:
            # an UNNAMED auto-cluster with one assigned face
            conn.execute(
                "INSERT INTO persons (id, name, face_count, auto_clustered,"
                " centroid) VALUES (9, '', 1, 1, ?)", (emb.tobytes(),))
            conn.execute(
                "INSERT INTO faces (photo_path, face_index, embedding,"
                " bbox_x1, bbox_y1, bbox_x2, bbox_y2, confidence, person_id)"
                " VALUES ('/cli/p0.jpg', 0, ?, 1, 1, 9, 9, 0.9, 9)",
                (emb.tobytes(),))
            # the NAMED person 1 needs a real face row to survive the
            # post-cluster stats refresh (empty persons are pruned)
            other = rng.standard_normal(512).astype(np.float32)
            other /= np.linalg.norm(other)
            conn.execute(
                "INSERT INTO faces (photo_path, face_index, embedding,"
                " bbox_x1, bbox_y1, bbox_x2, bbox_y2, confidence, person_id)"
                " VALUES ('/cli/p1.jpg', 0, ?, 1, 1, 9, 9, 0.9, 1)",
                (other.tobytes(),))
        code, out = run_cli(["--db", db, "--config", cfg,
                             "--cluster-faces-incremental-named"], capsys)
        assert code == 0 and "clustering:" in out
        with get_connection(db) as conn:
            # the unnamed person is gone, the named ones survive
            assert conn.execute(
                "SELECT COUNT(*) FROM persons WHERE id = 9").fetchone()[0] == 0
            assert conn.execute(
                "SELECT COUNT(*) FROM persons WHERE id = 1").fetchone()[0] == 1
            assert conn.execute(
                "SELECT person_id FROM faces WHERE photo_path = '/cli/p0.jpg'"
            ).fetchone()[0] != 9

    def test_dry_run_count_reaches_scorer(self, tmp_path, tmp_config,
                                          monkeypatch, capsys):
        import facet_tpu.processing.scorer as scorer_mod

        pics = tmp_path / "pics"
        pics.mkdir()
        for i in range(6):
            Image.new("RGB", (32, 24), (i * 30, 90, 120)).save(
                pics / f"s{i}.jpg")

        seen = {}

        class StubFacet:
            def __init__(self, *a, **kw):
                pass

            def get_already_scanned_set(self):
                return set()

            def score_paths(self, paths):
                seen["paths"] = list(paths)
                return ([{"path": p, "aggregate": 5.0, "aesthetic": 6.0,
                          "category": "default"} for p in paths], {})

        monkeypatch.setattr(scorer_mod, "Facet", StubFacet)
        db = str(tmp_path / "dr.db")
        code, out = run_cli(["--db", db, "--config", tmp_config, str(pics),
                             "--dry-run", "--dry-run-count", "3"], capsys)
        assert code == 0
        assert len(seen["paths"]) == 3
        assert "aggregate" in out

    def test_verbose_recommendations_table(self, cli_env, capsys):
        db, cfg = cli_env
        code, out = run_cli(["--db", db, "--config", cfg,
                             "--compute-recommendations", "--verbose"],
                            capsys)
        assert code == 0
        assert "scoring health" in out
        # the per-metric detail table only appears with --verbose
        assert "expected" in out and "tech_sharpness" in out


class TestLegacyFlagAliases:
    """The reference's exact flag spellings keep working
    (photos.py LEGACY_FLAGS; reference photos.py:149-170)."""

    def test_expansion_table(self):
        assert photos.expand_legacy_flags(["--export-csv"]) == \
            ["--export", "csv"]
        assert photos.expand_legacy_flags(
            ["--db", "x", "--apply-recommendations"]) == \
            ["--db", "x", "--compute-recommendations", "--apply"]
        assert photos.expand_legacy_flags(["--recompute-composition-gpu"]) \
            == ["--rescan-composition"]
        # non-legacy args pass through untouched
        assert photos.expand_legacy_flags(["--export", "json"]) == \
            ["--export", "json"]

    def test_legacy_export_csv_runs(self, cli_env, capsys, tmp_path):
        db, cfg = cli_env
        out_path = str(tmp_path / "legacy.csv")
        code, out = run_cli(["--db", db, "--config", cfg,
                             "--export-csv", "--export-path", out_path],
                            capsys)
        assert code == 0
        with open(out_path) as fh:
            assert "aggregate" in fh.readline()

    def test_legacy_recompute_burst_runs(self, cli_env, capsys):
        db, cfg = cli_env
        code, out = run_cli(["--db", db, "--config", cfg,
                             "--recompute-burst"], capsys)
        assert code == 0


class TestDatabaseCli:
    """database.py: user admin + the reference's maintenance flags."""

    def _db(self, cli_env):
        return cli_env

    def test_add_list_remove_user(self, cli_env, capsys):
        import database
        db, cfg = cli_env
        assert database.main(["add-user", "zoe", "--password", "pw",
                              "--role", "admin", "--display-name", "Zoe Q",
                              "--config", cfg, "--db", db]) == 0
        assert database.main(["list-users", "--config", cfg]) == 0
        out = capsys.readouterr().out
        assert "zoe: admin" in out
        import json
        with open(cfg) as fh:
            users = json.load(fh)["users"]
        assert users["zoe"]["display_name"] == "Zoe Q"
        assert database.main(["remove-user", "zoe", "--config", cfg]) == 0

    def test_maintenance_flags(self, cli_env, capsys, tmp_path):
        import database
        db, cfg = cli_env
        assert database.main(["--info", "--db", db, "--config", cfg]) == 0
        out = capsys.readouterr().out
        assert "photos:" in out
        assert database.main(["--optimize", "--db", db,
                              "--config", cfg]) == 0
        assert database.main(["--refresh-stats", "--db", db,
                              "--config", cfg]) == 0
        assert database.main(["--stats-info", "--db", db,
                              "--config", cfg]) == 0
        assert "updated" in capsys.readouterr().out
        assert database.main(["--migrate-tags", "--cleanup-orphaned-persons",
                              "--db", db, "--config", cfg]) == 0
        viewer = str(tmp_path / "viewer.db")
        assert database.main(["--export-viewer-db", viewer, "--db", db,
                              "--config", cfg]) == 0
        import sqlite3
        assert sqlite3.connect(viewer).execute(
            "SELECT COUNT(*) FROM photos").fetchone()[0] > 0

    def test_no_args_prints_usage(self, cli_env, capsys):
        import database
        db, cfg = cli_env
        assert database.main(["--config", cfg, "--db", db]) == 1


class TestTagExistingCli:
    def test_dry_run_counts(self, cli_env, capsys):
        import tag_existing
        db, cfg = cli_env
        assert tag_existing.main(["--db", db, "--config", cfg,
                                  "--dry-run", "--force"]) == 0
        out = capsys.readouterr().out
        assert "dry run:" in out


class TestSpeedTierFlag:
    def test_speed_tier_overrides_in_memory_only(self, tmp_path, tmp_config,
                                                 monkeypatch, capsys):
        import json

        import facet_tpu.processing.scorer as scorer_mod

        pics = tmp_path / "tier_pics"
        pics.mkdir()
        Image.new("RGB", (32, 24), (10, 90, 120)).save(pics / "a.jpg")

        seen = {}

        class StubFacet:
            def __init__(self, db_path, config, **kw):
                seen["tier"] = config.speed_tier()

            def get_already_scanned_set(self):
                return set()

            def score_paths(self, paths):
                return ([{"path": p, "aggregate": 5.0, "aesthetic": 6.0,
                          "category": "default"} for p in paths], {})

        monkeypatch.setattr(scorer_mod, "Facet", StubFacet)
        db = str(tmp_path / "tier.db")
        code, _ = run_cli(["--db", db, "--config", tmp_config, str(pics),
                           "--dry-run", "--speed-tier", "fast"], capsys)
        assert code == 0
        assert seen["tier"] == "fast"
        # one-run override: the on-disk config must NOT have been rewritten
        on_disk = json.load(open(tmp_config))
        assert on_disk.get("processing", {}).get("speed_tier", "exact") \
            == "exact"
        # and without the flag the default tier applies
        code, _ = run_cli(["--db", db, "--config", tmp_config, str(pics),
                           "--dry-run", "--force"], capsys)
        assert code == 0
        assert seen["tier"] == "exact"
