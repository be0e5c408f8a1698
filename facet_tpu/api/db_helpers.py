"""Shared database helpers for the API routers.

(reference: api/db_helpers.py:42-351) Live-column gating, tag filtering via
the photo_tags lookup (LIKE fallback), cached counts through stats_cache,
person attachment, and the per-user preference column indirection for
multi-user mode.
"""

import time

from facet_tpu.db.tags import is_photo_tags_populated

_column_cache = {"photos": None, "ts": 0.0}


def get_photo_columns(conn, max_age=60.0):
    now = time.time()
    if _column_cache["photos"] is None or now - _column_cache["ts"] > max_age:
        _column_cache["photos"] = {
            row[1] for row in conn.execute("PRAGMA table_info(photos)")}
        _column_cache["ts"] = now
    return _column_cache["photos"]


def reset_column_cache():
    _column_cache["photos"] = None


def tag_filter_sql(conn, tag):
    """WHERE fragment + params matching photos carrying a tag."""
    if is_photo_tags_populated(conn):
        return ("path IN (SELECT photo_path FROM photo_tags WHERE tag = ?)",
                [tag.lower()])
    return ("(',' || LOWER(IFNULL(tags,'')) || ',') LIKE ?",
            [f"%,%{tag.lower()}%,%".replace("%,%", "%")])


def visibility_clause(request):
    """Per-user rejected-photo visibility (multi-user indirection)."""
    user = request.state.get("user")
    if not user or user in ("anonymous", "viewer", "editor"):
        return "", []
    return (
        " AND path NOT IN (SELECT photo_path FROM user_preferences"
        "  WHERE user_id = ? AND is_rejected = 1)", [user])


def preference_columns(request):
    """(select_fragment, params): star/favorite/rejected, per-user when
    applicable, falling back to the photos columns."""
    user = request.state.get("user")
    if not user or user in ("anonymous", "viewer", "editor"):
        return ("p.star_rating, p.is_favorite, p.is_rejected", [])
    return (
        "IFNULL(up.star_rating, 0) AS star_rating,"
        " IFNULL(up.is_favorite, 0) AS is_favorite,"
        " IFNULL(up.is_rejected, 0) AS is_rejected", [user])


def preference_join(request):
    user = request.state.get("user")
    if not user or user in ("anonymous", "viewer", "editor"):
        return "", []
    return (" LEFT JOIN user_preferences up ON up.photo_path = p.path"
            " AND up.user_id = ?", [user])


def attach_person_data(conn, rows):
    """Add person_ids / person_names lists to each photo dict."""
    if not rows:
        return rows
    paths = [r["path"] for r in rows]
    marks = ",".join("?" for _ in paths)
    by_path = {}
    for path, pid, name in conn.execute(
            f"SELECT f.photo_path, f.person_id, pe.name FROM faces f"
            f" LEFT JOIN persons pe ON pe.id = f.person_id"
            f" WHERE f.photo_path IN ({marks}) AND f.person_id IS NOT NULL",
            paths):
        by_path.setdefault(path, []).append((pid, name))
    for row in rows:
        persons = by_path.get(row["path"], [])
        row["person_ids"] = [p for p, _ in persons]
        row["person_names"] = [n for _, n in persons if n]
    return rows


def split_tags_field(rows):
    for row in rows:
        tags = row.get("tags")
        row["tags"] = [t.strip() for t in tags.split(",") if t.strip()] if tags else []
    return rows


def get_cached_count(conn, where_sql, params, db_path=None):
    """COUNT(*) with the stats_cache fast path for the unfiltered case."""
    if not where_sql or where_sql == "1=1":
        from facet_tpu.db.stats_cache import get_cached_stat

        value, fresh = get_cached_stat(db_path, "total_photos")
        if fresh and value is not None:
            return int(value)
    return conn.execute(
        f"SELECT COUNT(*) FROM photos p WHERE {where_sql or '1=1'}", params
    ).fetchone()[0]
