"""Multi-host scaling: DCN work partitioning + shard merging.

The scoring workload is embarrassingly parallel over photos, so the
multi-host design (SURVEY §5) keeps DCN traffic to coordination only:

- `initialize()` joins the jax.distributed cluster (no-op single-host);
- each host scans its deterministic slice of the photo list into a LOCAL
  SQLite shard (DB writes never cross hosts);
- `merge_shards()` folds the per-host shards into the primary database at
  the end (photos + faces rows travel once, as rows, not tensors).

Device collectives stay intra-host on ICI; nothing in the scoring path
communicates over DCN.
"""

import os

from facet_tpu.db.connection import get_connection
from facet_tpu.db.schema import init_database


def initialize(coordinator=None, num_processes=None, process_id=None):
    """Join (or skip) the jax.distributed cluster. Returns (pid, nprocs)."""
    import jax

    if coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator
            or os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", 1)),
            process_id=process_id
            or int(os.environ.get("JAX_PROCESS_ID", 0)))
    return jax.process_index(), jax.process_count()


def partition_paths(paths, process_id=None, process_count=None):
    """Deterministic per-host slice of the photo list (strided, so hosts get
    similar size/shape mixes)."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    count = jax.process_count() if process_count is None else process_count
    return paths[pid::count]


def shard_db_path(base_path, process_id=None):
    import jax

    pid = jax.process_index() if process_id is None else process_id
    if pid == 0:
        return base_path
    root, ext = os.path.splitext(base_path)
    return f"{root}.shard{pid}{ext}"


def merge_shards(primary_path, shard_paths, verbose=True):
    """Fold per-host shards into the primary database (INSERT OR REPLACE on
    photos/faces/photo_tags; persons re-cluster afterwards)."""
    init_database(primary_path)
    merged = 0
    with get_connection(primary_path) as conn:
        for shard in shard_paths:
            if not os.path.exists(shard):
                continue
            conn.execute("ATTACH DATABASE ? AS shard", (shard,))
            try:
                cols = [r[1] for r in conn.execute("PRAGMA shard.table_info(photos)")]
                col_list = ", ".join(cols)
                cur = conn.execute(
                    f"INSERT OR REPLACE INTO photos ({col_list})"
                    f" SELECT {col_list} FROM shard.photos")
                merged += cur.rowcount
                conn.execute(
                    "INSERT OR REPLACE INTO faces (photo_path, face_index,"
                    " embedding, bbox_x1, bbox_y1, bbox_x2, bbox_y2,"
                    " confidence, face_thumbnail, landmark_2d_106)"
                    " SELECT photo_path, face_index, embedding, bbox_x1,"
                    " bbox_y1, bbox_x2, bbox_y2, confidence, face_thumbnail,"
                    " landmark_2d_106 FROM shard.faces")
                conn.execute(
                    "INSERT OR IGNORE INTO photo_tags (photo_path, tag)"
                    " SELECT photo_path, tag FROM shard.photo_tags")
                conn.commit()
            finally:
                conn.execute("DETACH DATABASE shard")
            if verbose:
                print(f"merged shard {shard}")
    return merged
