"""Pallas TPU kernel: row softmax over materialized attention scores.

The ViT's attention at 257 tokens materializes (B, 16, 257, 257) bf16
score tensors; the round-4 on-chip trace attributed ~0.9 ms/img of the
fused program to the convert/reduce fusions XLA emits for their softmax
(~5 HBM passes at ~230 GB/s effective). Full flash attention was measured
and REJECTED at this sequence length (clip.py resolve_attn_impl) — the
matmuls belong on XLA's side — but softmax itself is a pure streaming op:
this kernel reads each (head, 257, 257) score block into VMEM once,
reduces/exponentiates at the logical shape (Mosaic masks the padded
lanes), and writes the probabilities once — 2 HBM passes instead of ~5.

Numerics: the XLA path runs jax.nn.softmax on bf16 scores (bf16 exp);
this kernel upcasts the block to f32, softmaxes, and rounds once back to
bf16 — slightly MORE accurate, not less. Parity in
tests/test_pallas_softmax.py (interpret mode).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# heads per grid step: amortizes per-step overhead; 4 heads of f32
# (4, 257, 257) temporaries stay ~4 MB of VMEM
HEAD_BLOCK = 4


def _softmax_kernel(s_ref, o_ref):
    s = s_ref[0].astype(jnp.float32)                   # (HB, Q, K) logical
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = p.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("head_block", "interpret"))
def _softmax_call(s, head_block, interpret=False):
    b, h, nq, nk = s.shape
    return pl.pallas_call(
        _softmax_kernel,
        grid=(b, h // head_block),
        in_specs=[pl.BlockSpec((1, head_block, nq, nk),
                               lambda bi, hi: (bi, hi, 0, 0))],
        out_specs=pl.BlockSpec((1, head_block, nq, nk),
                               lambda bi, hi: (bi, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(s.shape, s.dtype),
        interpret=interpret,
    )(s)


def softmax_pallas(scores, head_block=None, interpret=None):
    """(B, H, Q, K) scores -> row softmax over K, same dtype.

    H must divide by head_block (16 ViT heads / 4 = 4 steps per image).
    interpret=None auto-selects interpreter mode on CPU backends.

    MEASURED AND REJECTED as the ViT softmax (round 4, fused member b256
    on v5e: xla 335.5 img/s vs psoftmax 311.2, head_block invariant) —
    kept, with its parity test, as the measured record; see docs/PERF.md.
    FACET_ATTN_IMPL=psoftmax re-enables it for probing.
    """
    if head_block is None:
        head_block = HEAD_BLOCK
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h = scores.shape[1]
    if h % head_block != 0:
        head_block = 1
    return _softmax_call(scores, int(head_block), bool(interpret))
