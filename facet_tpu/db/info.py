"""Schema introspection helpers (reference: db/info.py)."""

from facet_tpu.db.connection import get_connection


def get_table_names(db_path=None):
    with get_connection(db_path) as conn:
        return [
            r[0]
            for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name"
            )
        ]


def get_existing_columns(conn, table="photos"):
    """Set of live column names for a table (used by API column gating)."""
    return {row[1] for row in conn.execute(f"PRAGMA table_info({table})")}


def describe_database(db_path=None):
    """Summary dict: tables, row counts, column lists."""
    out = {}
    with get_connection(db_path) as conn:
        for (name,) in conn.execute(
            "SELECT name FROM sqlite_master WHERE type='table'"
        ).fetchall():
            try:
                count = conn.execute(f"SELECT COUNT(*) FROM {name}").fetchone()[0]
            except Exception:
                count = None
            cols = [row[1] for row in conn.execute(f"PRAGMA table_info({name})")]
            out[name] = {"rows": count, "columns": cols}
    return out
