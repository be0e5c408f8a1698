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
