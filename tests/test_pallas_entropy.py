"""hs_joint_hist_pallas / hs_entropy_pallas tests (interpret mode on CPU;
the compiled TPU path was verified on hardware to 2.9e-6 vs the same
oracle — tools/bench_entropy.py)."""

import numpy as np
import pytest

from facet_tpu.ops.pallas_entropy import (
    CHUNK,
    ROW_BLOCK,
    hs_entropy_pallas,
    hs_joint_hist_pallas,
)


def _oracle_hist(hh, ss):
    b = hh.shape[0]
    out = np.zeros((b, 180, 256), np.float32)
    for i in range(b):
        valid = hh[i] >= 0
        np.add.at(out[i], (hh[i][valid], ss[i][valid]), 1.0)
    return out


def test_joint_hist_matches_oracle():
    rng = np.random.default_rng(0)
    b, n = 3, CHUNK * 2
    hh = rng.integers(0, 180, (b, n), np.int32)
    ss = rng.integers(0, 256, (b, n), np.int32)
    hist = np.asarray(hs_joint_hist_pallas(hh, ss, interpret=True))
    assert hist.shape == (b, 180, 256)
    assert np.array_equal(hist, _oracle_hist(hh, ss))


def test_padding_rows_and_pixels_excluded():
    """Batch padded to ROW_BLOCK and pixels padded to CHUNK with hue=-1
    must land in no bin."""
    rng = np.random.default_rng(1)
    b, n = 2, CHUNK + 37          # forces both paddings internally
    hh = rng.integers(0, 180, (b, n), np.int32)
    ss = rng.integers(0, 256, (b, n), np.int32)
    hh[0, 5:9] = -1               # explicit caller-side padding markers
    hist = np.asarray(hs_joint_hist_pallas(hh, ss, interpret=True))
    oracle = _oracle_hist(hh, ss)
    assert np.array_equal(hist, oracle)
    assert hist[0].sum() == n - 4
    assert hist[1].sum() == n


def test_entropy_matches_numpy():
    rng = np.random.default_rng(2)
    b, n = ROW_BLOCK, CHUNK
    hh = rng.integers(0, 180, (b, n), np.int32)
    ss = rng.integers(0, 256, (b, n), np.int32)
    ent = np.asarray(hs_entropy_pallas(hh, ss, interpret=True))
    for i in range(b):
        counts = np.bincount(hh[i] * 256 + ss[i], minlength=180 * 256)
        p = counts[counts > 0] / n
        expected = -(p * np.log2(p)).sum()
        assert ent[i] == pytest.approx(expected, abs=1e-4)


def test_all_padding_image_yields_zero_entropy():
    hh = np.full((1, CHUNK), -1, np.int32)
    ss = np.zeros((1, CHUNK), np.int32)
    ent = np.asarray(hs_entropy_pallas(hh, ss, interpret=True))
    assert ent[0] == 0.0
