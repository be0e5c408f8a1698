"""Pallas TPU kernel: H-S joint entropy with VMEM-resident one-hots.

MEASURED AND REJECTED as the production path — kept, with its parity test,
as the measured record (decision table: docs/PERF.md).

The hypothesis: XLA's entropy formulation (ops/stats.py) materializes bf16
one-hot operands to HBM between the compare and the dot (~1.4 GB per
1.5 MP image), so building them in VMEM inside one kernel should win. Per
chunk of pixel codes the kernel builds both one-hots in the same
(bins, pixels) orientation —

    oh_ht (192, K)  =  (hue_iota_sublane == h_lane)     — 180 padded to 192
    oh_st (256, K)  =  (sat_iota_sublane == s_lane)

— contracts over the pixel (lane) dimension of both operands (the
flash-attention Q@K^T form) and accumulates the (192, 256) f32 joint
histogram in VMEM scratch; counts stay exact (< 2^24) and the final grid
step reduces the entropy scalar.

The measurement (TPU v5e, 1.5 MP): 6.9-7.7 ms/image, and an ablation with
CONSTANT operands shows the MXU `dot_general` alone costs all of it — a
192x256-output matmul inside a pallas kernel runs on ~1 MXU (~20 TFLOP/s)
because Mosaic does not split the huge contraction dimension across MXUs.
XLA's compare+dot DOES K-split and reaches ~50 TFLOP/s (3.05 ms/image),
so the one-hot HBM round trip it pays is cheaper than the MXUs pallas
leaves idle. bf16 vs int8 operands and operand orientation moved the
needle <10%.

Padding pixels carry hue 255 (matches no row 0..191) so they vanish from
the histogram; the valid-pixel count arrives as a prefetched scalar.
tests/test_pallas_entropy.py checks interpreter-mode parity against the
XLA formulation and a numpy oracle.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 8192
ROWS = 8         # chunk-rows per block: (8, CHUNK) int32 blocks tile cleanly
H_PAD = 192      # 180 hue bins padded to the bf16 sublane tile (16)
PAD_HUE = 255    # padding marker: matches no hue row


def _make_kernel(n_valid):
    """n_valid is static (H*W): no scalar prefetch needed."""

    def _entropy_kernel(h_ref, s_ref, out_ref, acc_ref):
        """Grid (B, nblocks); h_ref/s_ref blocks are (ROWS, CHUNK) int32 and
        acc_ref (H_PAD, 256) f32 persists across the block dimension."""
        bi = pl.program_id(0)
        ci = pl.program_id(1)
        nblocks = pl.num_programs(1)

        @pl.when(ci == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        hue_ids = jax.lax.broadcasted_iota(jnp.int32, (H_PAD, 1), 0)
        sat_ids = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
        acc = jnp.zeros((H_PAD, 256), jnp.float32)
        for r in range(ROWS):
            h_row = h_ref[r:r + 1, :]                         # (1, CHUNK)
            s_row = s_ref[r:r + 1, :]
            oh_ht = (hue_ids == h_row).astype(jnp.bfloat16)   # (H_PAD, K)
            oh_st = (sat_ids == s_row).astype(jnp.bfloat16)   # (256, K)
            acc = acc + jax.lax.dot_general(
                oh_ht, oh_st, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[:] += acc

        @pl.when(ci == nblocks - 1)
        def _():
            p = acc_ref[:] * (1.0 / float(n_valid))
            logp = jnp.where(p > 0.0,
                             jnp.log2(jnp.where(p > 0.0, p, 1.0)), 0.0)
            out_ref[bi, 0] = -jnp.sum(p * logp)

    return _entropy_kernel


@functools.partial(jax.jit, static_argnames=("n_valid", "interpret"))
def _entropy_call(hh, ss, n_valid, interpret=False):
    """hh/ss: (B, n_pad) int32 with n_pad a multiple of ROWS*CHUNK."""
    b, n_pad = hh.shape
    nblocks = n_pad // (ROWS * CHUNK)
    rows_total = b * n_pad // CHUNK
    hh = hh.reshape(rows_total, CHUNK)
    ss = ss.reshape(rows_total, CHUNK)
    out = pl.pallas_call(
        _make_kernel(n_valid),
        grid=(b, nblocks),
        in_specs=[
            pl.BlockSpec((ROWS, CHUNK),
                         lambda b_, c: (b_ * nblocks + c, 0)),
            pl.BlockSpec((ROWS, CHUNK),
                         lambda b_, c: (b_ * nblocks + c, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((H_PAD, 256), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        interpret=interpret,
    )(hh, ss)
    return out[:, 0]


def hs_entropy_pallas(hh, ss, n_valid=None, interpret=False):
    """(B, N) int32 hue bins / saturations -> (B,) joint entropy in bits.

    Pads N to the block size with out-of-range hue markers; n_valid
    defaults to N (pass it when the caller already padded)."""
    b, n = hh.shape
    if n_valid is None:
        n_valid = n
    block = ROWS * CHUNK
    n_pad = -(-n // block) * block
    if n_pad != n:
        hh = jnp.pad(hh, ((0, 0), (0, n_pad - n)), constant_values=PAD_HUE)
        ss = jnp.pad(ss, ((0, 0), (0, n_pad - n)))
    return _entropy_call(hh, ss, int(n_valid), interpret)
