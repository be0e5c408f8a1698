"""Interpret-mode parity for the one-pass fused stats kernel
(ops/pallas_fused_stats.py) against the XLA formulations and numpy
oracles — histogram and saturation must be EXACT, entropy to 1e-5."""

import numpy as np
import pytest

from facet_tpu.ops.stats import _batch_stats_impl, split_total


def _images(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    # include degenerate pixels: gray (diff=0), black (v=0), saturated
    base[:, 0, 0] = 128
    base[:, 0, 1] = 0
    base[:, 0, 2] = [255, 0, 0]
    return base


def _numpy_oracle(img):
    """Exact cv2-parity gray hist / sat sum / H-S entropy via colorspace."""
    import jax.numpy as jnp

    from facet_tpu.ops.colorspace import rgb_to_gray, rgb_to_hsv

    gray = np.asarray(rgb_to_gray(jnp.asarray(img)))
    hh, ss, _ = (np.asarray(x) for x in rgb_to_hsv(jnp.asarray(img)))
    hist = np.bincount(gray.ravel(), minlength=256)
    joint = np.zeros((180, 256), np.int64)
    np.add.at(joint, (hh.ravel(), ss.ravel()), 1)
    p = joint[joint > 0] / joint.sum()
    return hist, int(ss.sum()), float(-(p * np.log2(p)).sum())


class TestFusedStatsKernel:
    @pytest.mark.parametrize("shape", [(2, 40, 56), (1, 64, 72)])
    def test_matches_numpy_oracle(self, shape):
        b, h, w = shape
        imgs = _images(b, h, w, seed=3)
        from facet_tpu.ops.pallas_fused_stats import fused_stats_pallas

        ent, hist, sat = (np.asarray(x) for x in fused_stats_pallas(imgs))
        for i in range(b):
            want_hist, want_sat, want_ent = _numpy_oracle(imgs[i])
            np.testing.assert_array_equal(hist[i], want_hist)
            assert split_total(sat[i], 12) == want_sat
            assert abs(ent[i] - want_ent) < 1e-5, (ent[i], want_ent)

    def test_batch_stats_impl_contract(self):
        """entropy_impl='pallas_fused' must return the identical tuple
        contract (hist, split-sat pair, entropy, stencil pairs) as the
        XLA path — the fused program swaps impls with no caller change."""
        imgs = _images(2, 48, 64, seed=9)
        got = _batch_stats_impl(imgs, entropy_impl="pallas_fused")
        want = _batch_stats_impl(imgs, entropy_impl="xla")
        g_hist, g_sat, g_ent, g_lap, g_lapsq, g_imm = (
            np.asarray(x) for x in got)
        w_hist, w_sat, w_ent, w_lap, w_lapsq, w_imm = (
            np.asarray(x) for x in want)
        np.testing.assert_array_equal(g_hist, w_hist)
        for i in range(2):
            assert split_total(g_sat[i], 12) == split_total(w_sat[i], 12)
            assert abs(g_ent[i] - w_ent[i]) < 1e-5
        np.testing.assert_array_equal(g_lap, w_lap)
        np.testing.assert_array_equal(g_lapsq, w_lapsq)
        np.testing.assert_array_equal(g_imm, w_imm)

    def test_fast_tier_falls_back_to_ilp(self):
        """hs_subsample > 1 (the fast tier) must keep the stride semantics
        — pallas_fused silently degrades to the ILP entropy path."""
        imgs = _images(1, 40, 56, seed=5)
        got = _batch_stats_impl(imgs, hs_subsample=4,
                                entropy_impl="pallas_fused")
        want = _batch_stats_impl(imgs, hs_subsample=4,
                                 entropy_impl="pallas")
        assert abs(float(np.asarray(got[2])[0])
                   - float(np.asarray(want[2])[0])) < 1e-5
