"""Pallas TPU kernel: one-pass cross-attention for TOPIQ's C2 level.

TOPIQ's coarse-to-fine attention (models/topiq.py, reference
pyiqa cfanet — the reference runs it through pyiqa's torch CFANet,
models/pyiqa_scorer.py) attends 9216 C2 queries over 2304 C3 keys with
4 heads of dim 64. The XLA path (ChunkedAttention) materializes the
(B, 4, q_chunk, 2304) f32 score tensor to HBM per `lax.map` step, reads
it back for the softmax, and reads the probabilities again for the A@V
contraction: the round-4 on-chip trace (docs/traces/topiq_trace/)
attributes 0.96 ms/img to the chunk-sweep `while` body and another
0.46 ms/img to stacking its results — ~1 GB/image of score traffic in
and out of HBM.

This kernel is the flash-attention idea specialized to the shape: the
WHOLE key/value block for one (batch, head) pair is only
2304 x 64 x 4 B = 590 KB, so K and V simply live in VMEM and no online
(running-max) softmax is needed — each grid step loads one q block,
computes its (q_block, K) scores in VMEM, softmaxes, contracts with the
resident V, and writes the (q_block, 64) output. Scores never touch HBM.

Numerics match the XLA path's EFFECTIVE precision: XLA executes the f32
score/AV einsums as single-pass bf16 MXU passes under default matmul
precision (docs/PERF.md "Other measured facts"), so the kernel's explicit
bf16 casts round the same places; the softmax itself stays f32. Parity
vs the stock path is pinned in tests/test_pallas_attn.py (interpret
mode) and the end-score delta is measured on-chip (docs/PERF.md round 4).

PERF.md's round-4 flash-attention rejection ("do not retry at this
sequence length") is about the ViT's 257-token self-attention, where
padding to 384 and per-step overhead exceeded the tiny softmax traffic;
it explicitly notes flash "becomes interesting only if a future member
runs attention at >= 1k tokens" — this is that case (9216 x 2304).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_Q_BLOCK = 512


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    """One (batch, head, q-block) step.

    q_ref: (1, 1, QB, D) f32; k_ref/v_ref: (1, 1, K, D) f32 — constant
    along the q-block grid axis, so Mosaic keeps them resident in VMEM
    across consecutive steps instead of re-fetching; o_ref like q_ref.
    """
    q = q_ref[0, 0].astype(jnp.bfloat16)          # (QB, D)
    k = k_ref[0, 0].astype(jnp.bfloat16)          # (K, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (QB, K)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(jnp.bfloat16)
    v = v_ref[0, 0].astype(jnp.bfloat16)          # (K, D)
    o_ref[0, 0] = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("q_block", "interpret"))
def _attn_call(q, k, v, q_block, interpret=False):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    n_blocks = nq // q_block
    return pl.pallas_call(
        _attn_kernel,
        grid=(b, h, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, q_block, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, nk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, nk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, q_block, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.float32),
        interpret=interpret,
    )(q, k, v)


def supported_shape(nq, nk, q_block=None):
    """The kernel's applicability gate.

    Q must tile into q_block steps; K must be lane-aligned (no softmax
    mask is implemented — padded key columns would absorb probability).
    The >= 2 q-blocks floor keeps tiny levels (TOPIQ's 144/576-token
    blocks, the ViT's 257) on the XLA path where they belong.
    """
    if q_block is None:
        q_block = DEFAULT_Q_BLOCK
    return nq % q_block == 0 and nq // q_block >= 2 and nk % 128 == 0


def cross_attention_pallas(q, k, v, q_block=None, interpret=None):
    """(B, H, Q, D) f32 query x (B, H, K, D) f32 key/value -> (B, H, Q, D).

    q arrives pre-scaled (the caller divides by sqrt(D), matching
    ChunkedAttention). interpret=None auto-selects interpreter mode on
    CPU backends so tests and the multichip dryrun stay runnable.
    """
    if q_block is None:
        q_block = DEFAULT_Q_BLOCK
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, nq, d = q.shape
    if not supported_shape(nq, k.shape[2], q_block):
        raise ValueError(f"unsupported attention shape q={q.shape} k={k.shape}")
    return _attn_call(q, k, v, int(q_block), bool(interpret))
