"""Device compute kernels (JAX/XLA/Pallas).

The classical CV metric suite runs as batched device reductions: exact
OpenCV-parity color conversions and 3x3 stencils produce integer histograms
on device; tiny float64 epilogues on host turn those into the reference's
metric values bit-for-bit (analyzers/technical.py in the reference).
"""

from facet_tpu.ops.colorspace import rgb_to_gray, rgb_to_hsv
from facet_tpu.ops.stats import compute_batch_stats, ImageStats
from facet_tpu.ops.phash import phash_batch, phash_hex, hamming_distance

__all__ = [
    "rgb_to_gray",
    "rgb_to_hsv",
    "compute_batch_stats",
    "ImageStats",
    "phash_batch",
    "phash_hex",
    "hamming_distance",
]
