"""Multi-host partitioning + shard merge tests (single process, simulated)."""

import numpy as np

from facet_tpu.db.connection import get_connection
from facet_tpu.db.schema import init_database
from facet_tpu.parallel.multihost import (
    merge_shards,
    partition_paths,
    shard_db_path,
)


def test_partition_covers_all_disjointly():
    paths = [f"/p/{i}.jpg" for i in range(23)]
    parts = [partition_paths(paths, pid, 4) for pid in range(4)]
    flat = [p for part in parts for p in part]
    assert sorted(flat) == sorted(paths)
    assert all(len(set(a) & set(b)) == 0
               for i, a in enumerate(parts) for b in parts[i + 1:])


def test_shard_paths():
    assert shard_db_path("/x/db.sqlite", 0) == "/x/db.sqlite"
    assert shard_db_path("/x/db.sqlite", 2) == "/x/db.shard2.sqlite"


def test_merge_shards(tmp_path):
    primary = str(tmp_path / "main.db")
    init_database(primary)
    shards = []
    for pid in (1, 2):
        shard = str(tmp_path / f"main.shard{pid}.db")
        init_database(shard)
        with get_connection(shard) as conn:
            for i in range(3):
                path = f"/host{pid}/img{i}.jpg"
                conn.execute(
                    "INSERT INTO photos (path, aggregate, tags) VALUES (?, ?, 'sky')",
                    (path, 5.0 + pid))
                conn.execute(
                    "INSERT INTO photo_tags (photo_path, tag) VALUES (?, 'sky')",
                    (path,))
                conn.execute(
                    "INSERT INTO faces (photo_path, face_index, embedding)"
                    " VALUES (?, 0, ?)", (path, np.zeros(512, np.float32).tobytes()))
        shards.append(shard)

    merged = merge_shards(primary, shards, verbose=False)
    assert merged == 6
    with get_connection(primary) as conn:
        assert conn.execute("SELECT COUNT(*) FROM photos").fetchone()[0] == 6
        assert conn.execute("SELECT COUNT(*) FROM faces").fetchone()[0] == 6
        assert conn.execute("SELECT COUNT(*) FROM photo_tags").fetchone()[0] == 6
