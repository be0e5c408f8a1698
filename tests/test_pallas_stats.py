"""fused_gray_stats tests (XLA fallback path on CPU; the pallas TPU path is
bit-exact against the same oracle — verified on hardware)."""

import numpy as np

from facet_tpu.ops.pallas_stats import fused_gray_stats


def test_fallback_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, (3, 120, 170), dtype=np.int32)
    hist, lap_sum, lap_sq, imm_abs = fused_gray_stats(gray)

    p = np.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="reflect").astype(np.int64)
    lap = (p[:, :-2, 1:-1] + p[:, 2:, 1:-1] + p[:, 1:-1, :-2]
           + p[:, 1:-1, 2:] - 4 * p[:, 1:-1, 1:-1])
    imm = (p[:, :-2, :-2] - 2 * p[:, :-2, 1:-1] + p[:, :-2, 2:]
           - 2 * p[:, 1:-1, :-2] + 4 * p[:, 1:-1, 1:-1] - 2 * p[:, 1:-1, 2:]
           + p[:, 2:, :-2] - 2 * p[:, 2:, 1:-1] + p[:, 2:, 2:])

    for i in range(3):
        assert np.array_equal(
            hist[i], np.bincount(gray[i].reshape(-1), minlength=256))
    assert np.array_equal(lap_sum, lap.sum(axis=(1, 2)))
    assert np.array_equal(lap_sq, (lap ** 2).sum(axis=(1, 2)))
    assert np.array_equal(imm_abs, np.abs(imm).sum(axis=(1, 2)))


def test_lo_hi_split_roundtrip():
    """The 20-bit split used for lap^2 partials must be lossless."""
    vals = np.array([0, 1, (1 << 20) - 1, 1 << 20, 1_598_054_400], np.int64)
    lo = vals & 0xFFFFF
    hi = vals >> 20
    assert np.array_equal((hi << 20) + lo, vals)
