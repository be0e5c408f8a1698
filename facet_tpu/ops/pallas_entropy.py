"""Pallas TPU kernel: H-S joint histogram for the color-harmony entropy.

The color-harmony metric needs the entropy of the 180x256 hue-saturation
joint histogram over every pixel (reference analyzers/technical.py:79-113).
The XLA one-hot-matmul formulation is MXU-correct but materializes the
(pixels, 180) and (pixels, 256) one-hot operands to HBM between the compare
and the dot (~22 GB of traffic per 16-image batch at 1.5 MP — measured 45 ms
of the 70 ms total, tools/bench_entropy.py). This kernel builds the one-hot
tiles in VMEM, feeds the MXU directly, and accumulates the per-image joint
histogram in a resident VMEM output block, so HBM traffic is just the pixel
stream (int32 hue/sat in, 180x256 counts out).

Counts accumulate in f32: every bin count is < 2^24 at any supported image
size (16.7M pixels), so f32 accumulation stays exact.

Layout: hue/sat arrive as (B, N) int32 with B padded to a multiple of
ROW_BLOCK and N to a multiple of CHUNK (pad hue with -1 so padding matches
no bin). Grid is (B // ROW_BLOCK, N // CHUNK); each step handles ROW_BLOCK
images' pixel chunks, and the output block stays resident across a row
group's chunk steps (index map ignores the chunk axis), zeroed at step 0.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pixels per image per grid step. One-hot temporaries at 2K pixels:
# (2048, 180) + (2048, 256) bf16 = 1.8 MB, inside the 16 MB scoped VMEM
# alongside the double-buffered (ROW_BLOCK, 2048) int32 input blocks and
# the resident (ROW_BLOCK, 180, 256) f32 accumulator (1.5 MB).
CHUNK = 4096
# Images per block row: satisfies the sublane-divisibility rule (8) for the
# (ROW_BLOCK, CHUNK) int32 input blocks.
ROW_BLOCK = 8


def _hist_kernel(h_ref, s_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # Unrolled over rows: construction (VPU) of row r+1 is independent of
    # row r's dot (MXU), letting Mosaic overlap the two units.
    for r in range(ROW_BLOCK):
        hc = h_ref[r, :]
        sc = s_ref[r, :]
        oh_h = (hc[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, 180), 1)).astype(jnp.bfloat16)
        oh_s = (sc[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, 256), 1)).astype(jnp.bfloat16)
        out_ref[r] += jax.lax.dot_general(
            oh_h, oh_s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hs_joint_hist_pallas(hh, ss, interpret=False):
    """(B, N) int32 hue 0..179 (<0 = padding) and sat 0..255 -> (B, 180, 256)
    f32 exact joint-histogram counts. Pads B and N internally."""
    b, n = hh.shape
    bp = ((b + ROW_BLOCK - 1) // ROW_BLOCK) * ROW_BLOCK
    np_ = ((n + CHUNK - 1) // CHUNK) * CHUNK
    if (bp, np_) != (b, n):
        hh = jnp.pad(hh, ((0, bp - b), (0, np_ - n)), constant_values=-1)
        ss = jnp.pad(ss, ((0, bp - b), (0, np_ - n)))
    hist = pl.pallas_call(
        _hist_kernel,
        grid=(bp // ROW_BLOCK, np_ // CHUNK),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, CHUNK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, CHUNK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, 180, 256), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 180, 256), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * (180 + 256) * 128,
            bytes_accessed=2 * bp * np_ * 4 + bp * 180 * 256 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(hh, ss)
    return hist[:b]


def hs_entropy_pallas(hh, ss, interpret=False):
    """(B, N) hue/sat -> (B,) joint entropy in bits (padding: hue < 0)."""
    hist = hs_joint_hist_pallas(hh, ss, interpret=interpret)
    total = jnp.maximum(jnp.sum(hist, axis=(-2, -1), keepdims=True), 1.0)
    prob = hist / total
    return -jnp.sum(
        jnp.where(prob > 0, prob * jnp.log2(jnp.where(prob > 0, prob, 1.0)),
                  0.0), axis=(-2, -1))
