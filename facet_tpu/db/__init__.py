"""Persistence layer: SQLite with WAL, contract-compatible with the reference.

The photo database is the system's checkpoint: raw metrics, embeddings,
histograms and thumbnails are all stored so every score is recomputable
without re-reading the original images (reference: db/schema.py, SURVEY §5).
"""

from facet_tpu.db.connection import get_connection, apply_pragmas, resolve_db_path
from facet_tpu.db.schema import init_database, TABLES, PHOTO_COLUMNS
from facet_tpu.db.connection_pool import ConnectionPool, get_pool

__all__ = [
    "get_connection",
    "apply_pragmas",
    "resolve_db_path",
    "init_database",
    "TABLES",
    "PHOTO_COLUMNS",
    "ConnectionPool",
    "get_pool",
]
