"""Precomputed statistics cache for viewer performance.

Same contract as the reference (db/stats_cache.py): a `stats_cache` table of
key → stringified value + unix timestamp; `refresh_stats_cache()` recomputes
the standard aggregations, `get_cached_stat()` reads with a freshness window.
"""

import json
import sqlite3
import time

from facet_tpu.db.connection import get_connection

DEFAULT_MAX_AGE = 300.0  # seconds a cached value counts as fresh


def _put(conn, key, value, ts):
    conn.execute(
        "INSERT OR REPLACE INTO stats_cache (key, value, updated_at) VALUES (?, ?, ?)",
        (key, value if isinstance(value, str) else str(value), ts),
    )


def refresh_stats_cache(db_path=None, verbose=False):
    """Recompute every cached aggregation. Returns the stats dict."""
    stats = {}
    now = time.time()
    with get_connection(db_path) as conn:
        total = conn.execute("SELECT COUNT(*) FROM photos").fetchone()[0]
        stats["total_photos"] = total
        _put(conn, "total_photos", total, now)

        queries = {
            "count_hide_blinks": "SELECT COUNT(*) FROM photos WHERE is_blink = 0 OR is_blink IS NULL",
            "count_hide_bursts": "SELECT COUNT(*) FROM photos WHERE is_burst_lead = 1 OR is_burst_lead IS NULL",
            "count_hide_both": (
                "SELECT COUNT(*) FROM photos WHERE (is_blink = 0 OR is_blink IS NULL)"
                " AND (is_burst_lead = 1 OR is_burst_lead IS NULL)"
            ),
        }
        for key, sql in queries.items():
            try:
                val = conn.execute(sql).fetchone()[0]
                stats[key] = val
                _put(conn, key, val, now)
            except sqlite3.OperationalError:
                pass

        group_queries = {
            "cameras": (
                "SELECT camera_model, COUNT(*) AS cnt FROM photos"
                " WHERE camera_model IS NOT NULL GROUP BY camera_model ORDER BY cnt DESC"
            ),
            "lenses": (
                "SELECT lens_model, COUNT(*) AS cnt FROM photos"
                " WHERE lens_model IS NOT NULL GROUP BY lens_model ORDER BY cnt DESC"
            ),
            "categories": (
                "SELECT category, COUNT(*) AS cnt FROM photos"
                " WHERE category IS NOT NULL GROUP BY category ORDER BY cnt DESC"
            ),
        }
        for key, sql in group_queries.items():
            try:
                rows = [(r[0], r[1]) for r in conn.execute(sql)]
                stats[key] = rows
                _put(conn, key, json.dumps(rows), now)
            except sqlite3.OperationalError:
                pass

        try:
            # tags come from the photo_tags lookup when synced, else the
            # CSV column — same logic as the filter-options endpoint
            from facet_tpu.db.tags import is_photo_tags_populated

            if is_photo_tags_populated(conn):
                rows = [(r[0], r[1]) for r in conn.execute(
                    "SELECT tag, COUNT(*) AS cnt FROM photo_tags"
                    " GROUP BY tag ORDER BY cnt DESC, tag ASC")]
            else:
                counts = {}
                for (raw,) in conn.execute(
                        "SELECT tags FROM photos WHERE tags IS NOT NULL"
                        " AND tags != ''"):
                    for tag in raw.split(","):
                        tag = tag.strip()
                        if tag:
                            counts[tag] = counts.get(tag, 0) + 1
                rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            stats["tags"] = rows
            _put(conn, "tags", json.dumps(rows), now)
        except sqlite3.OperationalError:
            pass

        try:
            persons = conn.execute(
                "SELECT p.id, p.name, COUNT(DISTINCT f.photo_path) AS photo_count"
                " FROM persons p JOIN faces f ON f.person_id = p.id"
                " GROUP BY p.id HAVING photo_count > 0 ORDER BY photo_count DESC"
            ).fetchall()
            rows = [(r[0], r[1], r[2]) for r in persons]
            stats["persons"] = rows
            _put(conn, "persons", json.dumps(rows), now)
        except sqlite3.OperationalError:
            pass

        if verbose:
            for key, val in stats.items():
                size = len(val) if isinstance(val, list) else val
                print(f"  stats_cache[{key}] = {size}")
    return stats


def get_cached_stat(db_path=None, key=None, max_age_seconds=DEFAULT_MAX_AGE):
    """Fetch one cached stat → (value, is_fresh), or all stats as a dict."""
    now = time.time()
    try:
        with get_connection(db_path) as conn:
            if key is not None:
                row = conn.execute(
                    "SELECT value, updated_at FROM stats_cache WHERE key = ?", (key,)
                ).fetchone()
                if row is None:
                    return None, False
                value = _parse(row[0])
                return value, (now - (row[1] or 0)) <= max_age_seconds
            out = {}
            for k, v, ts in conn.execute("SELECT key, value, updated_at FROM stats_cache"):
                age = now - (ts or 0)
                out[k] = {"value": _parse(v), "fresh": age <= max_age_seconds, "age": age}
            return out
    except sqlite3.OperationalError:
        return (None, False) if key is not None else {}


def invalidate_stats_cache(db_path=None, keys=None):
    """Drop some (or all) cached stats so they get recomputed on next read."""
    with get_connection(db_path) as conn:
        if keys:
            conn.executemany("DELETE FROM stats_cache WHERE key = ?", [(k,) for k in keys])
        else:
            conn.execute("DELETE FROM stats_cache")


def _parse(raw):
    if raw is None:
        return None
    try:
        return json.loads(raw)
    except (ValueError, TypeError):
        try:
            return int(raw)
        except (ValueError, TypeError):
            return raw
