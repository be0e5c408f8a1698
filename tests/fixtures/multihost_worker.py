"""One host of the 2-process jax.distributed multi-host test.

Run by tests/test_multihost_live.py as a SUBPROCESS per simulated host:
joins the real jax.distributed cluster over a localhost coordinator,
verifies a cross-process collective (psum over a mesh spanning both
processes' devices), scans its `partition_paths` slice into its own
SQLite shard (DB writes never cross hosts — the production multi-host
contract, facet_tpu/parallel/multihost.py), and prints one JSON line the
parent asserts on.

argv: pid nprocs coordinator_port workdir
"""

import json
import os
import sys


def main():
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, workdir = sys.argv[3], sys.argv[4]

    # CPU-only by contract: drop the axon TPU hook's trigger before jax
    # import (same discipline as __graft_entry__.dryrun_multichip)
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["FACET_PLATFORM"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import facet_tpu  # noqa: F401  (applies FACET_PLATFORM)
    from facet_tpu.parallel.multihost import (initialize, partition_paths,
                                              shard_db_path)

    got_pid, got_n = initialize(coordinator=f"127.0.0.1:{port}",
                                num_processes=nprocs, process_id=pid)
    assert (got_pid, got_n) == (pid, nprocs), (got_pid, got_n)

    import jax
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()                    # GLOBAL device list (both procs)
    assert len(devs) == 2 * nprocs, devs
    mesh = Mesh(np.array(devs), ("dp",))
    psum = jax.jit(shard_map(lambda x: jax.lax.psum(x, "dp"), mesh=mesh,
                             in_specs=P("dp"), out_specs=P()))
    local = np.full((2,), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), local, global_shape=(2 * nprocs,))
    # DCN-style collective across ACTUAL process boundaries:
    # sum over hosts of 2 * (pid + 1) = 2 * (1 + 2) = 6 for nprocs=2
    total = float(np.asarray(jax.device_get(psum(arr)))[0])

    # each host scans ITS slice into ITS OWN shard (strided partition)
    paths = [f"/library/img{i:02d}.jpg" for i in range(7)]
    mine = partition_paths(paths)           # uses jax.process_index()
    primary = os.path.join(workdir, "photos.db")
    shard = shard_db_path(primary)          # pid 0 -> primary itself

    from facet_tpu.db.connection import get_connection
    from facet_tpu.db.schema import init_database

    init_database(shard)
    with get_connection(shard) as conn:
        for path in mine:
            conn.execute(
                "INSERT INTO photos (path, aggregate, tags, config_version)"
                " VALUES (?, ?, 'sky', 'mh-test')", (path, 5.0 + pid))
            conn.execute(
                "INSERT INTO photo_tags (photo_path, tag) VALUES (?, 'sky')",
                (path,))
        conn.commit()

    print(json.dumps({"pid": pid, "psum": total, "shard": shard,
                      "scanned": sorted(mine),
                      "global_devices": len(devs)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
