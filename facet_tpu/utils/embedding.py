"""Embedding blob helpers (reference: utils/embedding.py)."""

import numpy as np


def embedding_to_bytes(vec):
    return np.asarray(vec, np.float32).tobytes()


def bytes_to_embedding(blob, dim=None):
    """BLOB -> float32 vector; returns None for malformed blobs."""
    if blob is None:
        return None
    vec = np.frombuffer(blob, dtype=np.float32)
    if dim is not None and vec.shape[0] != dim:
        return None
    return vec
