"""Device mesh construction and batch sharding helpers.

Default topology: all local devices on a 1-D 'dp' axis (batch data
parallelism — the ensemble models at these sizes don't need tensor
sharding on v5e; a 2-D ('dp', 'tp') mesh is supported for the VLM tagger).
"""

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count():
    return len(jax.devices())


@functools.lru_cache(maxsize=8)
def get_mesh(dp=None, tp=1, devices=None):
    """Build a ('dp', 'tp') mesh. dp defaults to n_devices / tp."""
    devs = list(devices) if devices is not None else jax.devices()
    if dp is None:
        dp = len(devs) // tp
    devs = devs[: dp * tp]
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh, ndim=1):
    """Shard the leading (batch) axis over 'dp'; others replicated."""
    spec = P(*(("dp",) + (None,) * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(n, multiple):
    """Smallest m >= n with m % multiple == 0 (batch padding for even shards)."""
    return ((n + multiple - 1) // multiple) * multiple


def shard_batch(array, mesh=None):
    """Place a host batch onto the mesh, sharded along axis 0.

    Pads the batch up to a multiple of the dp size with zeros; returns
    (device_array, original_length).
    """
    mesh = mesh or get_mesh()
    dp = mesh.shape["dp"]
    n = array.shape[0]
    padded = pad_to_multiple(max(n, 1), dp)
    if padded != n:
        pad_width = [(0, padded - n)] + [(0, 0)] * (array.ndim - 1)
        array = np.pad(array, pad_width)
    sharding = batch_sharding(mesh, array.ndim)
    return jax.device_put(array, sharding), n
