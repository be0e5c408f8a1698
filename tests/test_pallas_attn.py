"""Parity: the pallas one-pass cross-attention kernel vs the XLA path.

The kernel (ops/pallas_attn.py) ships as the TPU default for TOPIQ's C2
cross-scale attention (9216 queries x 2304 keys); on CPU it runs in
interpreter mode here, against (a) a bf16-rounded oracle that mirrors the
kernel's stated numerics exactly, and (b) the f32 ChunkedAttention path it
replaces (loose tolerance — the XLA path on CPU is true f32, while on TPU
both paths round through bf16 MXU passes; docs/PERF.md round 4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facet_tpu.ops import pallas_attn


def _oracle(q, k, v, dtype=jnp.float32):
    """Reference attention: (B, H, Q, D) x (B, H, K, D) -> (B, H, Q, D)."""
    qd = q.astype(dtype)
    kd = k.astype(dtype)
    s = jnp.einsum("bhqd,bhkd->bhqk", qd, kd,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(dtype), v.astype(dtype),
                      preferred_element_type=jnp.float32)


def _rand(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("b,h,nq,nk,d,qb", [
    (2, 2, 1024, 256, 64, 512),
    (1, 4, 512, 128, 32, 256),
])
def test_kernel_matches_bf16_oracle(b, h, nq, nk, d, qb):
    q = _rand((b, h, nq, d), 1) / np.sqrt(d)
    k = _rand((b, h, nk, d), 2)
    v = _rand((b, h, nk, d), 3)
    got = np.asarray(pallas_attn.cross_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        q_block=qb, interpret=True))
    want = np.asarray(_oracle(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              dtype=jnp.bfloat16))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_kernel_close_to_f32_path():
    q = _rand((1, 2, 1024, 64), 4) / 8.0
    k = _rand((1, 2, 256, 64), 5)
    v = _rand((1, 2, 256, 64), 6)
    got = np.asarray(pallas_attn.cross_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True))
    want = np.asarray(_oracle(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, atol=2.5e-2, rtol=2.5e-2)


def test_shape_gate():
    assert pallas_attn.supported_shape(9216, 2304)       # TOPIQ C2
    assert not pallas_attn.supported_shape(2304, 576)    # K not lane-aligned
    assert not pallas_attn.supported_shape(257, 257)     # the ViT
    assert not pallas_attn.supported_shape(512, 128)     # single block
    with pytest.raises(ValueError):
        pallas_attn.cross_attention_pallas(
            jnp.zeros((1, 1, 257, 64)), jnp.zeros((1, 1, 257, 64)),
            jnp.zeros((1, 1, 257, 64)), interpret=True)


def test_chunked_attention_pallas_path_matches_xla(monkeypatch):
    """The ChunkedAttention module itself, pallas vs xla impl."""
    from facet_tpu.models.topiq import ChunkedAttention

    mod = ChunkedAttention(num_heads=4, qkv_features=256)
    q_in = jnp.asarray(_rand((2, 1024, 256), 7))
    kv_in = jnp.asarray(_rand((2, 128, 256), 8))
    params = mod.init(jax.random.PRNGKey(0), q_in, kv_in)

    monkeypatch.setenv("FACET_TOPIQ_ATTN", "xla")
    want = np.asarray(mod.apply(params, q_in, kv_in))
    monkeypatch.setenv("FACET_TOPIQ_ATTN", "pallas")
    got = np.asarray(mod.apply(params, q_in, kv_in))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=4e-2, rtol=4e-2)
