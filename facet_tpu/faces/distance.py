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


def pairwise_cosine(embeddings, chunk=4096):
    """(N, D) normalized -> (N, N) float32 cosine similarity."""
    emb = jnp.asarray(embeddings)
    n = embeddings.shape[0]
    out = np.empty((n, n), np.float32)
    for start in range(0, n, chunk):
        rows = emb[start:start + chunk]
        out[start:start + chunk] = np.asarray(jax.device_get(
            _cosine_chunk(rows, emb)))
    return out


def pairwise_euclidean(embeddings, chunk=4096):
    """Euclidean distances between L2-normalized embeddings."""
    cos = pairwise_cosine(embeddings, chunk)
    d2 = np.clip(2.0 - 2.0 * cos, 0.0, None)
    np.fill_diagonal(d2, 0.0)
    return np.sqrt(d2)


def cosine_to_euclidean_eps(cos_eps):
    """Cosine-distance epsilon -> euclidean epsilon on the unit sphere."""
    return float(np.sqrt(2.0 * cos_eps))
