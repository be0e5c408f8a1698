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
    """n_valid is static (H*W); 0 means self-normalize by the histogram
    total (padding pixels carry out-of-range hue so they hit no bin —
    the ILP kernel's convention, immune to pre-padded callers)."""

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
            if n_valid:
                p = acc_ref[:] * (1.0 / float(n_valid))
            else:
                p = acc_ref[:] / jnp.sum(acc_ref[:])
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

    Pads N to the block size with out-of-range hue markers. By default the
    entropy self-normalizes by the in-range pixel count (the ILP kernel's
    convention), so callers that pre-padded with out-of-range markers get
    the exact answer without plumbing a count; pass n_valid to force a
    specific denominator."""
    b, n = hh.shape
    if n_valid is None:
        n_valid = 0
    block = ROWS * CHUNK
    n_pad = -(-n // block) * block
    if n_pad != n:
        hh = jnp.pad(hh, ((0, 0), (0, n_pad - n)), constant_values=PAD_HUE)
        ss = jnp.pad(ss, ((0, 0), (0, n_pad - n)))
    return _entropy_call(hh, ss, int(n_valid), interpret)


# ---------------------------------------------------------------------------
# Round-4 ILP kernel: independent dot CHAINS for MXU occupancy.
#
# The round-2 kernel above serializes its per-row dots through ONE
# accumulator value (`acc = acc + dot(...)`): every dot depends on the
# previous one, so Mosaic can keep only ~1 MXU busy (~20 TFLOP/s measured).
# This variant K-splits each row's contraction into `splits` independent
# sub-dots, each feeding its OWN accumulator chain — the data dependences
# between consecutive dots vanish and the scheduler can overlap several MXU
# pipelines (v5e has 4 MXUs per TensorCore). `packed` additionally packs two
# S bins per matmul column as {0, 1, 4096} bf16 entries (the radix trick
# from ops/stats.py — exact because per-dot counts stay < 4096 when the
# sub-dot contraction is <= 2048 pixels), halving the matmul passes; the
# even/odd count planes accumulate side by side in a (H_PAD, 256) scratch
# and are never interleaved (entropy is permutation-invariant over bins).
# `use_int8` builds int8 one-hots for the MXU's double-rate int8 path.
# ---------------------------------------------------------------------------

MAX_SPLIT_PACKED = 2048   # per-dot pixel cap for exact {0,1,4096} unpacking


def _make_ilp_kernel(splits, packed, use_int8):
    sub = CHUNK // splits
    if packed:
        assert sub <= MAX_SPLIT_PACKED and not use_int8
    n_cols = 128 if packed else 256
    oh_dtype = jnp.int8 if use_int8 else jnp.bfloat16
    acc_dtype = jnp.int32 if use_int8 else jnp.float32

    def _kernel(h_ref, s_ref, out_ref, acc_ref):
        bi = pl.program_id(0)
        ci = pl.program_id(1)
        nblocks = pl.num_programs(1)

        @pl.when(ci == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        hue_ids = jax.lax.broadcasted_iota(jnp.int32, (H_PAD, 1), 0)
        sat_ids = jax.lax.broadcasted_iota(jnp.int32, (n_cols, 1), 0)
        # independent accumulator chains: accs[j] only ever consumes dot j
        # of each row, so the `splits` dots of a row have no dependence on
        # one another (packed keeps separate even/odd chains per split)
        if packed:
            accs = [jnp.zeros((H_PAD, 2 * n_cols), jnp.float32)
                    for _ in range(splits)]
        else:
            accs = [jnp.zeros((H_PAD, n_cols), jnp.float32)
                    for _ in range(splits)]
        for r in range(ROWS):
            h_row = h_ref[r:r + 1, :]                        # (1, CHUNK)
            s_row = s_ref[r:r + 1, :]
            oh_ht = (hue_ids == h_row).astype(oh_dtype)      # (H_PAD, CHUNK)
            if packed:
                weight = jnp.where((s_row & 1) == 1, 4096.0, 1.0).astype(
                    jnp.bfloat16)
                oh_st = ((sat_ids == (s_row >> 1)).astype(jnp.bfloat16)
                         * weight)                            # (128, CHUNK)
            else:
                oh_st = (sat_ids == s_row).astype(oh_dtype)  # (256, CHUNK)
            for j in range(splits):
                a = jax.lax.dot_general(
                    oh_ht[:, j * sub:(j + 1) * sub],
                    oh_st[:, j * sub:(j + 1) * sub],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dtype)
                if packed:
                    c_odd = jnp.floor(a * (1.0 / 4096.0))
                    c_even = a - c_odd * 4096.0
                    accs[j] = accs[j] + jnp.concatenate(
                        [c_even, c_odd], axis=1)
                else:
                    accs[j] = accs[j] + a.astype(jnp.float32)
        total = accs[0]
        for j in range(1, splits):
            total = total + accs[j]
        acc_ref[:] += total

        @pl.when(ci == nblocks - 1)
        def _():
            # self-normalizing: padding pixels (hue outside 0..191) hit no
            # bin, so the histogram total IS the valid-pixel count — no
            # n_valid plumbing, and arbitrary padding is handled exactly
            p = acc_ref[:] * (1.0 / jnp.sum(acc_ref[:]))
            logp = jnp.where(p > 0.0,
                             jnp.log2(jnp.where(p > 0.0, p, 1.0)), 0.0)
            out_ref[bi, 0] = -jnp.sum(p * logp)

    return _kernel


@functools.partial(jax.jit, static_argnames=("splits", "packed",
                                             "use_int8", "interpret"))
def _entropy_ilp_call(hh, ss, splits, packed, use_int8,
                      interpret=False):
    b, n_pad = hh.shape
    nblocks = n_pad // (ROWS * CHUNK)
    rows_total = b * n_pad // CHUNK
    hh = hh.reshape(rows_total, CHUNK)
    ss = ss.reshape(rows_total, CHUNK)
    out = pl.pallas_call(
        _make_ilp_kernel(splits, packed, use_int8),
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


def hs_entropy_pallas_ilp(hh, ss, splits=4, packed=True,
                          use_int8=False, interpret=None):
    """ILP variant of hs_entropy_pallas — see the block comment above.

    packed requires CHUNK/splits <= 2048 (exact radix unpacking); splits=4
    at the default CHUNK=8192 satisfies it. Pixels whose hue falls outside
    0..191 (e.g. the caller's -1 padding markers or this function's own
    block padding) are excluded exactly: the entropy normalizes by the
    histogram total, not the nominal pixel count.

    interpret=None auto-selects interpreter mode on CPU backends so the
    kernel stays runnable (slowly) in CPU tests and the multichip dryrun.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n = hh.shape
    block = ROWS * CHUNK
    n_pad = -(-n // block) * block
    if n_pad != n:
        hh = jnp.pad(hh, ((0, 0), (0, n_pad - n)), constant_values=PAD_HUE)
        ss = jnp.pad(ss, ((0, 0), (0, n_pad - n)))
    return _entropy_ilp_call(hh, ss, int(splits), bool(packed),
                             bool(use_int8), interpret)
