"""Persistence layer tests: schema contract, pragmas, pool, stats cache, tags."""

import sqlite3
import threading

import pytest

from facet_tpu.db import get_connection, init_database
from facet_tpu.db.connection_pool import ConnectionPool
from facet_tpu.db.info import describe_database, get_existing_columns
from facet_tpu.db.schema import TABLES, table_columns
from facet_tpu.db.stats_cache import get_cached_stat, refresh_stats_cache
from facet_tpu.db.tags import migrate_tags_to_lookup, split_tags, sync_photo_tags

EXPECTED_TABLES = {
    "photos", "faces", "persons", "photo_tags", "comparisons", "learned_scores",
    "weight_optimization_runs", "stats_cache", "weight_config_snapshots",
    "recommendation_history", "user_preferences",
}

# Columns the reference schema guarantees (db/schema.py:14-91) — the viewer,
# validator and exports rely on these exact names.
REQUIRED_PHOTO_COLUMNS = {
    "path", "filename", "date_taken", "camera_model", "lens_model", "iso",
    "f_stop", "shutter_speed", "focal_length", "focal_length_35mm",
    "image_width", "image_height", "aesthetic", "face_count", "face_quality",
    "eye_sharpness", "face_sharpness", "face_ratio", "tech_sharpness",
    "color_score", "exposure_score", "comp_score", "isolation_bonus",
    "aggregate", "is_blink", "is_burst_lead", "is_monochrome", "is_silhouette",
    "is_group_portrait", "duplicate_group_id", "is_duplicate_lead",
    "clip_embedding", "raw_sharpness_variance", "histogram_data",
    "histogram_spread", "mean_luminance", "histogram_bimodality",
    "power_point_score", "raw_color_entropy", "raw_eye_sharpness",
    "shadow_clipped", "highlight_clipped", "dynamic_range_stops", "noise_sigma",
    "contrast_score", "mean_saturation", "leading_lines_score",
    "face_confidence", "thumbnail", "phash", "config_version", "tags",
    "quality_score", "topiq_score", "composition_explanation", "scoring_model",
    "composition_pattern", "category", "star_rating", "is_favorite",
    "is_rejected",
}


def test_init_creates_all_tables(tmp_db):
    info = describe_database(tmp_db)
    assert EXPECTED_TABLES <= set(info)


def test_photos_column_contract(tmp_db):
    with get_connection(tmp_db) as conn:
        cols = get_existing_columns(conn, "photos")
    assert REQUIRED_PHOTO_COLUMNS <= cols
    assert set(table_columns("photos")) == cols


def test_init_is_idempotent(tmp_db):
    init_database(tmp_db)
    init_database(tmp_db)


def test_migration_adds_missing_columns(tmp_path):
    path = str(tmp_path / "old.db")
    with sqlite3.connect(path) as conn:
        conn.execute("CREATE TABLE photos (path TEXT PRIMARY KEY, filename TEXT)")
    init_database(path)
    with get_connection(path) as conn:
        cols = get_existing_columns(conn, "photos")
    assert REQUIRED_PHOTO_COLUMNS <= cols


def test_pragmas(tmp_db):
    with get_connection(tmp_db) as conn:
        assert conn.execute("PRAGMA journal_mode").fetchone()[0] == "wal"
        assert conn.execute("PRAGMA foreign_keys").fetchone()[0] == 1


def test_score_range_constraints(tmp_db):
    with get_connection(tmp_db) as conn:
        conn.execute("INSERT INTO photos (path, aggregate) VALUES ('/a.jpg', 7.5)")
    with pytest.raises(sqlite3.IntegrityError):
        with get_connection(tmp_db) as conn:
            conn.execute("INSERT INTO photos (path, aggregate) VALUES ('/b.jpg', 11.0)")


def test_faces_cascade_delete(tmp_db):
    with get_connection(tmp_db) as conn:
        conn.execute("INSERT INTO photos (path) VALUES ('/p.jpg')")
        conn.execute(
            "INSERT INTO faces (photo_path, face_index, embedding) VALUES ('/p.jpg', 0, x'00')"
        )
    with get_connection(tmp_db) as conn:
        conn.execute("DELETE FROM photos WHERE path='/p.jpg'")
        assert conn.execute("SELECT COUNT(*) FROM faces").fetchone()[0] == 0


def test_connection_pool_roundtrip(tmp_db):
    pool = ConnectionPool(tmp_db, max_connections=3)
    results = []

    def worker():
        with pool.connection() as conn:
            results.append(conn.execute("SELECT COUNT(*) FROM photos").fetchone()[0])

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [0] * 8
    pool.close()


def test_pool_rolls_back_on_release(tmp_db):
    pool = ConnectionPool(tmp_db, max_connections=1)
    with pool.connection() as conn:
        conn.execute("INSERT INTO photos (path) VALUES ('/x.jpg')")
        # no commit: release must roll back
    with pool.connection() as conn:
        assert conn.execute("SELECT COUNT(*) FROM photos").fetchone()[0] == 0
    pool.close()


def test_stats_cache_roundtrip(tmp_db):
    with get_connection(tmp_db) as conn:
        conn.execute(
            "INSERT INTO photos (path, camera_model, is_blink) VALUES ('/a.jpg', 'X100', 0)"
        )
        conn.execute(
            "INSERT INTO photos (path, camera_model, is_blink) VALUES ('/b.jpg', 'X100', 1)"
        )
    stats = refresh_stats_cache(tmp_db)
    assert stats["total_photos"] == 2
    assert stats["count_hide_blinks"] == 1
    assert stats["cameras"] == [("X100", 2)]
    value, fresh = get_cached_stat(tmp_db, "total_photos")
    assert value == 2 and fresh


def test_tag_lookup_sync(tmp_db):
    assert split_tags(" Sunset, beach ,,sunset") == ["sunset", "beach", "sunset"]
    with get_connection(tmp_db) as conn:
        conn.execute("INSERT INTO photos (path, tags) VALUES ('/a.jpg', 'sunset, beach')")
        sync_photo_tags(conn, "/a.jpg", "sunset, beach")
    n = migrate_tags_to_lookup(tmp_db, verbose=False)
    assert n == 1
    with get_connection(tmp_db) as conn:
        rows = conn.execute(
            "SELECT tag FROM photo_tags WHERE photo_path='/a.jpg' ORDER BY tag"
        ).fetchall()
    assert [r[0] for r in rows] == ["beach", "sunset"]


def test_pool_rejects_rebinding_to_other_db(tmp_db, tmp_path):
    """get_pool silently returning a pool bound to a DIFFERENT database
    reads/writes the wrong file (round-4 review finding)."""
    from facet_tpu.db.connection_pool import get_pool, reset_pool

    reset_pool()
    try:
        pool = get_pool(tmp_db)
        assert get_pool(tmp_db) is pool          # same path: fine
        assert get_pool() is pool                # None means 'the pool'
        with pytest.raises(ValueError):
            get_pool(str(tmp_path / "other.db"))
    finally:
        reset_pool()


def test_pool_surfaces_connect_errors_without_deadlock(tmp_path):
    """A failing sqlite3.connect must raise out of acquire() promptly —
    the old error path re-acquired the held non-reentrant lock and hung
    the whole server (round-4 review finding)."""
    from facet_tpu.db.connection_pool import ConnectionPool

    pool = ConnectionPool(str(tmp_path / "nodir" / "x.db"))
    with pytest.raises(Exception):
        pool.acquire(timeout=0.5)
    # the slot was released: a second attempt raises again (not a hang on
    # an exhausted counter)
    with pytest.raises(Exception):
        pool.acquire(timeout=0.5)
