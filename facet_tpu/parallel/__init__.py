"""SPMD parallelism: device mesh + sharding policy.

The engine's unit of parallelism is the image batch (SURVEY §2.11): scoring
is data-parallel over a 1-D 'dp' axis, with an optional 'tp' axis reserved
for tensor-sharding the larger ensemble members. Collectives are implicit —
we annotate shardings and let XLA insert all_gathers/psums over ICI.
"""

from facet_tpu.parallel.mesh import (
    get_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    pad_to_multiple,
    local_device_count,
)

__all__ = [
    "get_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "pad_to_multiple",
    "local_device_count",
]
