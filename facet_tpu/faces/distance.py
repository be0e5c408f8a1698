"""Pairwise face-embedding distances on device.

The clustering hot spot: an (N, 512) @ (512, N) cosine-similarity matmul on
the MXU replaces the reference's cuML/CPU distance computation
(faces/clusterer.py:162-197). Euclidean distances over L2-normalized vectors
derive as sqrt(2 - 2cos); chunked over rows to bound memory at large N.
"""

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _cosine_chunk(chunk, all_embeddings):
    return chunk @ all_embeddings.T


def normalize_embeddings(embeddings):
    embeddings = np.asarray(embeddings, np.float32)
    norms = np.linalg.norm(embeddings, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return embeddings / norms


def pairwise_cosine(embeddings, chunk=4096, mesh=None):
    """(N, D) normalized -> (N, N) float32 cosine similarity.

    With a mesh, rows shard over 'dp' (each chip holds the full embedding
    matrix once — 512-d faces replicate cheaply — and computes its row
    block locally; SURVEY §2.11 maps this to the all-gather family: the
    gather happens once on the replicated operand instead of per step)."""
    if mesh is not None:
        return _pairwise_cosine_sharded(embeddings, mesh)
    emb = jnp.asarray(embeddings)
    n = embeddings.shape[0]
    out = np.empty((n, n), np.float32)
    for start in range(0, n, chunk):
        rows = emb[start:start + chunk]
        out[start:start + chunk] = np.asarray(jax.device_get(
            _cosine_chunk(rows, emb)))
    return out


def _pairwise_cosine_sharded(embeddings, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from facet_tpu.parallel.mesh import pad_to_multiple

    emb = np.asarray(embeddings, np.float32)
    n = emb.shape[0]
    dp = mesh.shape["dp"]
    padded = pad_to_multiple(n, dp)
    if padded != n:
        emb_rows = np.pad(emb, ((0, padded - n), (0, 0)))
    else:
        emb_rows = emb
    rows = jax.device_put(emb_rows, NamedSharding(mesh, P("dp", None)))
    full = jax.device_put(emb, NamedSharding(mesh, P()))
    out = jax.jit(
        lambda r, f: r @ f.T,
        out_shardings=NamedSharding(mesh, P("dp", None)))(rows, full)
    return np.asarray(jax.device_get(out))[:n]


def pairwise_euclidean(embeddings, chunk=4096):
    """Euclidean distances between L2-normalized embeddings."""
    cos = pairwise_cosine(embeddings, chunk)
    d2 = np.clip(2.0 - 2.0 * cos, 0.0, None)
    np.fill_diagonal(d2, 0.0)
    return np.sqrt(d2)


def cosine_to_euclidean_eps(cos_eps):
    """Cosine-distance epsilon -> euclidean epsilon on the unit sphere."""
    return float(np.sqrt(2.0 * cos_eps))
