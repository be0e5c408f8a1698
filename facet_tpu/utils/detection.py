"""Silhouette detection helper (reference: utils/detection.py:8).

The histogram-mass heuristic: heavy shadows AND significant highlights
indicate an intentional backlit subject. Shares the formula with the device
metric suite (facet_tpu/analyzers/technical.py histogram block); this wrapper
evaluates it for a single image or a stored histogram.
"""

import numpy as np


def detect_silhouette(gray_hist, lower_third_threshold=0.35,
                      upper_third_threshold=0.25):
    """(256,) histogram counts -> 1 if silhouette-like else 0."""
    counts = np.asarray(gray_hist, np.float64)
    total = counts.sum()
    if total <= 0:
        return 0
    norm = counts / total
    lower = norm[:85].sum()
    upper = norm[170:].sum()
    return 1 if (lower > lower_third_threshold and upper > upper_third_threshold) else 0


def detect_silhouette_image(rgb):
    """RGB uint8 array -> silhouette flag (device histogram + heuristic)."""
    from facet_tpu.ops.stats import compute_batch_stats

    stats = compute_batch_stats([rgb])[0]
    return detect_silhouette(stats.gray_hist)
