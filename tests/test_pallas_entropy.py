"""Interpreter-mode parity for the pallas H-S entropy kernels: exact
agreement with a numpy histogram oracle and with the XLA radix formulation
in ops/stats.py.

Two kernels: hs_entropy_pallas (round 2, single accumulator chain —
superseded) and hs_entropy_pallas_ilp (round 4, split independent dot
chains + radix-packed S side — the production TPU path: 0.45 ms/img of
device time vs the XLA path's 1.58, docs/PERF.md)."""

import numpy as np


def oracle_entropy(hh, ss):
    out = []
    for i in range(hh.shape[0]):
        hist, _, _ = np.histogram2d(hh[i], ss[i], bins=[180, 256],
                                    range=[[0, 180], [0, 256]])
        p = hist / hist.sum()
        nz = p > 0
        out.append(-(p[nz] * np.log2(p[nz])).sum())
    return np.array(out)


class TestPallasEntropy:
    def test_matches_oracle_interpret_mode(self):
        import jax.numpy as jnp

        from facet_tpu.ops.pallas_entropy import hs_entropy_pallas

        rng = np.random.default_rng(0)
        b, n = 2, 4000        # forces padding to the 64K block
        hh = (rng.gamma(2.0, 12.0, (b, n)).astype(np.int32)) % 180
        ss = rng.integers(0, 256, (b, n)).astype(np.int32)
        got = np.asarray(hs_entropy_pallas(
            jnp.asarray(hh), jnp.asarray(ss), interpret=True))
        np.testing.assert_allclose(got, oracle_entropy(hh, ss),
                                   atol=1e-5, rtol=1e-5)

    def test_matches_xla_formulation(self):
        import jax
        import jax.numpy as jnp

        from facet_tpu.ops.pallas_entropy import hs_entropy_pallas
        from facet_tpu.ops.stats import _batch_stats_impl

        rng = np.random.default_rng(1)
        rgb = rng.integers(0, 256, (2, 24, 32, 3)).astype(np.uint8)
        from facet_tpu.ops.colorspace import rgb_to_hsv

        hh, ss, _ = rgb_to_hsv(jnp.asarray(rgb))
        want = np.asarray(jax.device_get(
            _batch_stats_impl(jnp.asarray(rgb))[2]))
        got = np.asarray(hs_entropy_pallas(
            hh.reshape(2, -1), ss.reshape(2, -1), interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


class TestPallasEntropyILP:
    def _rand(self, b, n, seed):
        rng = np.random.default_rng(seed)
        hh = (rng.gamma(2.0, 12.0, (b, n)).astype(np.int32)) % 180
        ss = rng.integers(0, 256, (b, n)).astype(np.int32)
        return hh, ss

    def test_variants_match_oracle(self):
        import jax.numpy as jnp

        from facet_tpu.ops.pallas_entropy import hs_entropy_pallas_ilp

        hh, ss = self._rand(2, 5000, 2)   # padding forced (n << 64K block)
        want = oracle_entropy(hh, ss)
        for splits, packed, int8 in [(2, False, False), (4, True, False),
                                     (8, True, False), (4, False, True)]:
            got = np.asarray(hs_entropy_pallas_ilp(
                jnp.asarray(hh), jnp.asarray(ss), splits=splits,
                packed=packed, use_int8=int8, interpret=True))
            np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5,
                                       err_msg=f"splits={splits} "
                                               f"packed={packed} int8={int8}")

    def test_caller_padding_markers_excluded(self):
        """-1 hue markers (the stats-path padding convention) must vanish
        from the histogram AND the normalization denominator."""
        import jax.numpy as jnp

        from facet_tpu.ops.pallas_entropy import hs_entropy_pallas_ilp

        hh, ss = self._rand(1, 3000, 3)
        hp = np.full((1, 4096), -1, np.int32)
        hp[:, :3000] = hh
        sp = np.zeros((1, 4096), np.int32)
        sp[:, :3000] = ss
        got = np.asarray(hs_entropy_pallas_ilp(
            jnp.asarray(hp), jnp.asarray(sp), interpret=True))
        np.testing.assert_allclose(got, oracle_entropy(hh, ss),
                                   atol=1e-5, rtol=1e-5)

    def test_batch_stats_pallas_impl_matches_xla(self):
        """entropy_impl='pallas' inside the stats program == 'xla' result."""
        import jax
        import jax.numpy as jnp

        from facet_tpu.ops.stats import _batch_stats_impl

        rng = np.random.default_rng(4)
        rgb = rng.integers(0, 256, (2, 40, 56, 3)).astype(np.uint8)
        want = np.asarray(jax.device_get(
            _batch_stats_impl(jnp.asarray(rgb), entropy_impl="xla")[2]))
        got = np.asarray(jax.device_get(
            _batch_stats_impl(jnp.asarray(rgb), entropy_impl="pallas")[2]))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_prepadded_caller_without_n_valid():
    """Round-4 review regression: a caller that already padded with
    out-of-range hue markers and passes NO n_valid must get the exact
    entropy — the round-2 kernel now self-normalizes by the in-range
    count (the ILP kernel's convention) instead of defaulting the
    denominator to the padded length."""
    import jax.numpy as jnp

    from facet_tpu.ops.pallas_entropy import hs_entropy_pallas

    rng = np.random.default_rng(9)
    hh = (rng.gamma(2.0, 12.0, (1, 3000)).astype(np.int32)) % 180
    ss = rng.integers(0, 256, (1, 3000)).astype(np.int32)
    hp = np.full((1, 4096), -1, np.int32)
    hp[:, :3000] = hh
    sp = np.zeros((1, 4096), np.int32)
    sp[:, :3000] = ss
    got = np.asarray(hs_entropy_pallas(
        jnp.asarray(hp), jnp.asarray(sp), interpret=True))
    np.testing.assert_allclose(got, oracle_entropy(hh, ss),
                               atol=1e-5, rtol=1e-5)
