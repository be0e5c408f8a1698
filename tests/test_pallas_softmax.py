"""Parity: the pallas row-softmax kernel (measured-and-rejected record).

The kernel lost to XLA's softmax in the fused ViT (docs/PERF.md round 4)
and ships only behind FACET_ATTN_IMPL=psoftmax; this pins that the probe
path stays correct, including the 257-lane masked reductions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facet_tpu.ops.pallas_softmax import softmax_pallas


@pytest.mark.parametrize("b,h,q,k,hb", [
    (2, 8, 257, 257, 4),    # the ViT shape (odd lanes -> masked reduce)
    (1, 3, 64, 128, 4),     # heads not divisible by head_block -> hb=1
])
def test_matches_f32_softmax(b, h, q, k, hb):
    rng = np.random.default_rng(b * 100 + h)
    s = jnp.asarray(rng.normal(size=(b, h, q, k)).astype(np.float32) * 4.0
                    ).astype(jnp.bfloat16)
    got = np.asarray(softmax_pallas(s, head_block=hb, interpret=True),
                     dtype=np.float32)
    want = np.asarray(jax.nn.softmax(s.astype(jnp.float32), axis=-1))
    # outputs round once to bf16 (eps ~7.8e-3 near 1.0)
    np.testing.assert_allclose(got, want, atol=1e-2)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-2)


def test_vision_tower_psoftmax_path():
    """The Attention module's psoftmax branch end-to-end (tiny tower)."""
    from facet_tpu.models.clip import Attention

    mod = Attention(width=64, heads=4, dtype=jnp.float32,
                    attn_impl="psoftmax")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 257, 64)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)
    got = np.asarray(mod.apply(params, x))
    want = np.asarray(Attention(width=64, heads=4, dtype=jnp.float32,
                                attn_impl="xla").apply(params, x))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
