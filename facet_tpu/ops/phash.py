"""64-bit perceptual hash (pHash) as a device kernel.

Algorithm (same family as the reference's imagehash.phash, processing/
scorer.py:972): grayscale -> 32x32 area resize -> 2D DCT-II -> top-left 8x8
low-frequency block -> threshold at the block median -> 64 bits.

TPU-first formulation: the resize is an exact area-interpolation expressed as
two matmuls (L @ img @ R with precomputed per-shape weight matrices) and the
DCT is a 32x32 matmul, so the whole hash is three small matmuls per image.
Hashes are self-consistent across the engine (burst grouping + duplicate
detection both use hamming distance on these), matching the reference's
*semantics*; bit-exact imagehash parity is not required by any consumer.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.ops.colorspace import rgb_to_gray

HASH_SIZE = 8
RESIZE = 32


@functools.lru_cache(maxsize=128)
def _area_weights(src, dst):
    """(dst, src) float32 exact area-interpolation weight matrix."""
    w = np.zeros((dst, src), np.float32)
    scale = src / dst
    for i in range(dst):
        left = i * scale
        right = (i + 1) * scale
        lo = int(np.floor(left))
        hi = int(np.ceil(right))
        for j in range(lo, min(hi, src)):
            overlap = min(right, j + 1) - max(left, j)
            if overlap > 0:
                w[i, j] = overlap / scale
    return w


@functools.lru_cache(maxsize=1)
def _dct_matrix():
    """(32, 32) DCT-II basis (scipy.fftpack.dct norm=None convention)."""
    n = RESIZE
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    return (2.0 * np.cos(np.pi * k * (2 * x + 1) / (2 * n))).astype(np.float32)


@jax.jit
def _phash_kernel(rgb_batch, row_w, col_w):
    """(B, H, W, 3) uint8 -> (B, 64) bool hash bits."""
    gray = rgb_to_gray(rgb_batch).astype(jnp.float32)          # (B, H, W)
    small = jnp.einsum("rh,bhw,wc->brc", row_w, gray, col_w)   # (B, 32, 32)
    d = jnp.asarray(_dct_matrix())
    freq = d @ small @ d.T                                     # 2D DCT-II
    low = freq[:, :HASH_SIZE, :HASH_SIZE].reshape(-1, HASH_SIZE * HASH_SIZE)
    med = jnp.median(low, axis=1, keepdims=True)
    return low > med


def _bits_to_hex(bits):
    """(64,) bool -> 16-char hex string (row-major, MSB first)."""
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return f"{val:016x}"


def phash_hex(image):
    """Hash a single RGB uint8 array -> hex string."""
    return phash_batch([image])[0]


def phash_batch(images):
    """Hash a list of RGB uint8 arrays; returns aligned list of hex strings."""
    results = [None] * len(images)
    by_shape = {}
    for i, img in enumerate(images):
        by_shape.setdefault(img.shape[:2], []).append(i)
    for (h, w), indices in by_shape.items():
        row_w = jnp.asarray(_area_weights(h, RESIZE))
        col_w = jnp.asarray(_area_weights(w, RESIZE)).T
        batch = np.stack([images[i] for i in indices])
        bits = np.asarray(jax.device_get(_phash_kernel(jnp.asarray(batch), row_w, col_w)))
        for j, idx in enumerate(indices):
            results[idx] = _bits_to_hex(bits[j])
    return results


def hamming_distance(hex_a, hex_b):
    """Bit distance between two hex hash strings (0-64)."""
    return bin(int(hex_a, 16) ^ int(hex_b, 16)).count("1")


def similarity_percent(hex_a, hex_b):
    """100 * (1 - hamming/64), the scale the burst/duplicate configs use."""
    return 100.0 * (1.0 - hamming_distance(hex_a, hex_b) / 64.0)
