"""Database maintenance: vacuum/analyze, orphan cleanup, viewer export.

Covers the roles of the reference maintenance module (db/maintenance.py:12-125):
space reclamation, query-planner stats, removal of persons with no faces, and
export of a slimmed viewer database with small thumbnails.
"""

import io
import os
import sqlite3

from facet_tpu.db.connection import get_connection, resolve_db_path
from facet_tpu.db.schema import init_database


def vacuum_database(db_path=None, verbose=True):
    """VACUUM + ANALYZE + PRAGMA optimize. Returns bytes reclaimed."""
    path = resolve_db_path(db_path)
    before = os.path.getsize(path) if os.path.exists(path) else 0
    conn = sqlite3.connect(path)
    try:
        conn.execute("VACUUM")
        conn.execute("ANALYZE")
        conn.execute("PRAGMA optimize")
    finally:
        conn.close()
    after = os.path.getsize(path)
    if verbose:
        print(f"vacuum: {before} -> {after} bytes ({before - after} reclaimed)")
    return before - after


def cleanup_orphaned_persons(db_path=None, verbose=True):
    """Delete persons that no longer have any face rows pointing at them."""
    with get_connection(db_path) as conn:
        cur = conn.execute(
            "DELETE FROM persons WHERE id NOT IN"
            " (SELECT DISTINCT person_id FROM faces WHERE person_id IS NOT NULL)"
        )
        if verbose and cur.rowcount:
            print(f"removed {cur.rowcount} orphaned persons")
        return cur.rowcount


def cleanup_missing_files(db_path=None, dry_run=False, verbose=True):
    """Remove photo rows whose files no longer exist on disk."""
    removed = []
    with get_connection(db_path) as conn:
        for (path,) in conn.execute("SELECT path FROM photos"):
            if not os.path.exists(path):
                removed.append(path)
        if removed and not dry_run:
            conn.executemany("DELETE FROM photos WHERE path = ?", [(p,) for p in removed])
    if verbose:
        verb = "would remove" if dry_run else "removed"
        print(f"{verb} {len(removed)} rows for missing files")
    return removed


def export_viewer_db(db_path=None, out_path="viewer_export.db", thumb_size=320, verbose=True):
    """Export a slim read-only database for the viewer: photo rows with
    thumbnails recompressed to `thumb_size` px, no raw blobs or face data."""
    from PIL import Image

    src = resolve_db_path(db_path)
    if os.path.exists(out_path):
        os.remove(out_path)
    init_database(out_path)

    keep_cols = None
    with get_connection(src) as conn, get_connection(out_path) as out:
        cols = [r[1] for r in conn.execute("PRAGMA table_info(photos)")]
        drop = {"clip_embedding", "histogram_data"}
        keep_cols = [c for c in cols if c not in drop]
        col_list = ", ".join(keep_cols)
        placeholders = ", ".join("?" for _ in keep_cols)
        thumb_idx = keep_cols.index("thumbnail")

        n = 0
        for row in conn.execute(f"SELECT {col_list} FROM photos"):
            values = list(row)
            blob = values[thumb_idx]
            if blob:
                try:
                    img = Image.open(io.BytesIO(blob))
                    img.thumbnail((thumb_size, thumb_size))
                    buf = io.BytesIO()
                    img.convert("RGB").save(buf, "JPEG", quality=75)
                    values[thumb_idx] = buf.getvalue()
                except Exception:
                    values[thumb_idx] = None
            out.execute(
                f"INSERT OR REPLACE INTO photos ({col_list}) VALUES ({placeholders})", values
            )
            n += 1
    if verbose:
        print(f"exported {n} photos to {out_path}")
    return out_path
