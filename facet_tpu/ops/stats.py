"""Fused per-image statistics kernel: the device half of the technical suite.

One jitted program computes, for a batch of same-shape RGB images, every
reduction the classical metric suite needs (reference formulas in
analyzers/technical.py:29-342):

- 256-bin gray histogram            -> exposure / spread / percentiles /
                                       contrast / dynamic range / histogram blob
- 256-bin saturation histogram      -> mean saturation / monochrome
- H-S joint entropy (f32 scalar)    -> color harmony
- 2041-bin Laplacian histogram      -> sharpness variance (exact, from counts)
- 2041-bin |Immerkaer| histogram    -> noise sigma (exact, from counts)

Histograms are integer counts, so the float64 epilogues on host reproduce the
reference's numpy math exactly; the per-pixel work (color conversion, two 3x3
stencils, binning) all happens on device. Stencils use reflect-101 borders to
match cv2's default.

The public entry point `compute_batch_stats` groups arbitrary-shaped images
into (H, W) buckets with power-of-two batch padding so XLA compiles one
program per image shape, not per call.
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.ops.colorspace import rgb_to_gray, rgb_to_hsv

LAP_BINS = 2041       # Laplacian of uint8 is in [-1020, 1020]
IMM_BINS = 2041       # |Immerkaer response| of uint8 is in [0, 2040]
HS_BINS = 180 * 256


@dataclass
class ImageStats:
    """Host-side view of one image's device statistics."""

    height: int
    width: int
    gray_hist: np.ndarray      # (256,) int32
    sat_hist: np.ndarray       # (256,) int32
    hs_entropy: float          # bits, f32 device reduction
    lap_hist: np.ndarray       # (2041,) int32, value = bin - 1020
    imm_abs_hist: np.ndarray   # (2041,) int32, value = bin


def _reflect101_pad(img):
    """Pad by 1 with cv2's default BORDER_REFLECT_101 (edge not repeated)."""
    return jnp.pad(img, 1, mode="reflect")


def _stencil3x3(padded, k):
    """3x3 correlation via shifted adds; k is a 3x3 python int list."""
    h, w = padded.shape[0] - 2, padded.shape[1] - 2
    out = jnp.zeros((h, w), jnp.int32)
    for di in range(3):
        for dj in range(3):
            coef = k[di][dj]
            if coef:
                out = out + coef * padded[di:di + h, dj:dj + w]
    return out


def _hist(values, length):
    return jnp.bincount(values.reshape(-1), length=length)


def _single_image_stats(rgb):
    """Per-image statistics; vmapped over the batch."""
    gray = rgb_to_gray(rgb)
    h, s, _ = rgb_to_hsv(rgb)

    padded = _reflect101_pad(gray)
    lap = _stencil3x3(padded, [[0, 1, 0], [1, -4, 1], [0, 1, 0]])
    imm = _stencil3x3(padded, [[1, -2, 1], [-2, 4, -2], [1, -2, 1]])

    gray_hist = _hist(gray, 256)
    sat_hist = _hist(s, 256)
    lap_hist = _hist(lap + 1020, LAP_BINS)
    imm_hist = _hist(jnp.abs(imm), IMM_BINS)

    # H-S joint entropy in f32 on device (within ~1e-4 of the reference's
    # float32 numpy path; the joint histogram never leaves the chip).
    hs_hist = _hist(h * 256 + s, HS_BINS).astype(jnp.float32)
    total = jnp.sum(hs_hist)
    p = hs_hist / total
    entropy = -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0))

    return gray_hist, sat_hist, entropy, lap_hist, imm_hist


@functools.partial(jax.jit, static_argnames=())
def _batch_stats(rgb_batch):
    """(B, H, W, 3) uint8 -> tuple of batched stats."""
    return jax.vmap(_single_image_stats)(rgb_batch)


def _bucket_size(n):
    """Pad batch to a power of two (capped) to bound recompilation."""
    size = 1
    while size < n:
        size *= 2
    return min(size, 256)


def compute_batch_stats(images):
    """Compute device statistics for a list of RGB uint8 numpy arrays.

    Images are grouped by (H, W) so each distinct shape compiles once; the
    batch dimension is padded to powers of two. Returns a list of ImageStats
    aligned with the input order.
    """
    results = [None] * len(images)
    by_shape = {}
    for i, img in enumerate(images):
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(f"image {i}: expected (H, W, 3) RGB, got {img.shape}")
        if img.shape[0] < 3 or img.shape[1] < 3:
            raise ValueError(f"image {i}: too small for 3x3 stencils: {img.shape}")
        by_shape.setdefault(img.shape[:2], []).append(i)

    for (h, w), indices in by_shape.items():
        pos = 0
        while pos < len(indices):
            chunk = indices[pos:pos + 256]
            padded_n = _bucket_size(len(chunk))
            batch = np.zeros((padded_n, h, w, 3), np.uint8)
            for j, idx in enumerate(chunk):
                batch[j] = images[idx]
            gray_h, sat_h, entropy, lap_h, imm_h = jax.device_get(
                _batch_stats(jnp.asarray(batch))
            )
            for j, idx in enumerate(chunk):
                results[idx] = ImageStats(
                    height=h,
                    width=w,
                    gray_hist=np.asarray(gray_h[j]),
                    sat_hist=np.asarray(sat_h[j]),
                    hs_entropy=float(entropy[j]),
                    lap_hist=np.asarray(lap_h[j]),
                    imm_abs_hist=np.asarray(imm_h[j]),
                )
            pos += len(chunk)
    return results
