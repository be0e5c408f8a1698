"""Interpreter-mode parity for the (measured-and-rejected) pallas H-S
entropy kernel: exact agreement with a numpy histogram oracle and with the
production XLA formulation in ops/stats.py."""

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
