"""Pallas TPU kernel: fused gray-image statistics in one VMEM pass.

The XLA formulation of the classical statistics streams the gray image from
HBM once per reduction family (histogram, Laplacian sums, Immerkaer sums).
This kernel makes a single double-buffered pass: row tiles DMA from HBM into
VMEM while the previous tile computes, and every reduction — the 256-bin
histogram (compare-against-iota), the Laplacian sum/sum-of-squares and the
|Immerkaer| sum — updates VMEM accumulators in the same loop.

Outputs per image:
- hist   (256,)        int32 exact counts
- sums   (TILES, 4)    int32 per-tile partials
  [lap_sum, lapsq_lo20, lapsq_hi, imm_abs_sum] — lap^2 splits into 20-bit
  lo / hi halves so every partial stays int32-exact at any image size; the
  host recombines in int64.

Input: gray int32 with a 1px reflect border, shape (B, H+2, W+2) — the
border rows make the 3x3 stencils exact at the edges without in-kernel
branching.

This is an optional accelerated path: `fused_gray_stats` falls back to the
XLA implementation on CPU (pallas TPU kernels don't lower there), and the
test suite checks bit-exact agreement between both paths.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 128          # rows per DMA step (x width lanes)
N_BUFFERS = 2


def _stats_kernel(true_dims_ref, gray_ref, hist_ref, sums_ref):
    """One grid step = one image; gray_ref is the WHOLE padded array resident
    in HBM, sliced by aligned DMA slabs; true height/width come in as scalar
    prefetch so padding never contributes."""
    img = pl.program_id(0)
    height = true_dims_ref[0]
    width = true_dims_ref[1]
    _, h_slab, w_pad = gray_ref.shape
    n_tiles = pl.cdiv(gray_ref.shape[1] - 8, ROW_TILE)

    def body(scratch, sem_ref):
        bins = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)

        def get_dma(slot, tile_idx):
            # halo slab: ROW_TILE+8 rows (DMA slices must be 8-row aligned);
            # rows [0 .. ROW_TILE+1] carry the stencil window, the tail pads
            return pltpu.make_async_copy(
                gray_ref.at[img, pl.ds(tile_idx * ROW_TILE, ROW_TILE + 8), :],
                scratch.at[slot],
                sem_ref.at[slot],
            )

        get_dma(0, 0).start()

        def loop_body(tile_idx, _):
            slot = tile_idx % N_BUFFERS
            next_slot = (tile_idx + 1) % N_BUFFERS

            @pl.when(tile_idx + 1 < n_tiles)
            def _():
                get_dma(next_slot, tile_idx + 1).start()

            get_dma(slot, tile_idx).wait()
            tile = scratch[slot][: ROW_TILE + 2]       # (ROW_TILE+2, W+2)

            # rows/cols past the true image extent must not contribute
            out_w = w_pad - 2
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (ROW_TILE, out_w), 0) + tile_idx * ROW_TILE
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, out_w), 1)
            valid = (row_ids < height) & (col_ids < width)

            center = tile[1:-1, 1:-1]
            up, down = tile[:-2, 1:-1], tile[2:, 1:-1]
            left, right = tile[1:-1, :-2], tile[1:-1, 2:]
            ul, ur = tile[:-2, :-2], tile[:-2, 2:]
            dl, dr = tile[2:, :-2], tile[2:, 2:]

            lap = up + down + left + right - 4 * center
            imm = (ul - 2 * up + ur - 2 * left + 4 * center - 2 * right
                   + dl - 2 * down + dr)
            lap = jnp.where(valid, lap, 0)
            imm_abs = jnp.where(valid, jnp.abs(imm), 0)

            sums_ref[img, tile_idx, 0] = jnp.sum(lap)
            # lap^2 over a 196K-pixel slab overflows int32: per-row sums stay
            # exact (<= 1.6e9), then split into 20-bit lo / high parts
            row_sq = jnp.sum(lap * lap, axis=1)
            sums_ref[img, tile_idx, 1] = jnp.sum(row_sq & 0xFFFFF)
            sums_ref[img, tile_idx, 2] = jnp.sum(row_sq >> 20)
            sums_ref[img, tile_idx, 3] = jnp.sum(imm_abs)

            # histogram: per-bin compare-reduce over the VMEM-resident tile
            # (256 passes over on-chip data; no flattening — Mosaic-friendly)
            pixels = jnp.where(valid, center, -1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)

            def hist_bin(b_idx, acc):
                cnt = jnp.sum((pixels == b_idx).astype(jnp.int32))
                return acc + jnp.where(lane == b_idx, cnt, 0)

            counts = jax.lax.fori_loop(
                0, 256, hist_bin, jnp.zeros((1, 256), jnp.int32))[0]

            @pl.when(tile_idx == 0)
            def _():
                hist_ref[img, :] = counts

            @pl.when(tile_idx > 0)
            def _():
                hist_ref[img, :] = hist_ref[img, :] + counts

        jax.lax.fori_loop(0, n_tiles, loop_body, None)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((N_BUFFERS, ROW_TILE + 8, w_pad), jnp.int32),
        sem_ref=pltpu.SemaphoreType.DMA((N_BUFFERS,)),
    )


@functools.partial(jax.jit, static_argnames=())
def _pallas_gray_stats(gray_padded):
    """(B, H+2, W+2) int32 -> (hist (B,256) int32, sums (B,TILES,4) int32)."""
    b, h_pad, w_pad = gray_padded.shape
    height = h_pad - 2
    n_tiles = -(-height // ROW_TILE)

    # pad rows so every tile's aligned halo slab exists, and pad columns to
    # the 128-lane tiling (both masked in-kernel via true height/width)
    need = n_tiles * ROW_TILE + 8
    col_pad = (-w_pad) % 128
    gray_padded = jnp.pad(gray_padded,
                          ((0, 0), (0, max(0, need - h_pad)), (0, col_pad)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalar per-tile partials
        ),
    )
    kernel = pl.pallas_call(
        _stats_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, 256), jnp.int32),
            jax.ShapeDtypeStruct((b, n_tiles, 4), jnp.int32),
        ),
    )
    true_dims = jnp.array([height, w_pad - 2], jnp.int32)
    return kernel(true_dims, gray_padded)


def pallas_available():
    return jax.devices()[0].platform == "tpu"


def fused_gray_stats(gray):
    """(B, H, W) int32 gray -> (hist (B,256), lap_sum, lap_sumsq, imm_abs)
    as numpy, using the Pallas kernel on TPU and plain XLA elsewhere.
    """
    padded = jnp.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    if pallas_available():
        hist, sums = jax.device_get(_pallas_gray_stats(padded))
        sums64 = np.asarray(sums, np.int64).sum(axis=1)
        lap_sumsq = (sums64[:, 2] << 20) + sums64[:, 1]
        return (np.asarray(hist), sums64[:, 0], lap_sumsq, sums64[:, 3])
    # XLA fallback (CPU test platform)
    b = gray.shape[0]
    bins = jnp.arange(256, dtype=jnp.int32)
    hist = jnp.sum(gray.reshape(b, -1)[:, :, None] == bins[None, None, :],
                   axis=1, dtype=jnp.int32)
    lap = (padded[:, :-2, 1:-1] + padded[:, 2:, 1:-1] + padded[:, 1:-1, :-2]
           + padded[:, 1:-1, 2:] - 4 * padded[:, 1:-1, 1:-1])
    imm = (padded[:, :-2, :-2] - 2 * padded[:, :-2, 1:-1] + padded[:, :-2, 2:]
           - 2 * padded[:, 1:-1, :-2] + 4 * padded[:, 1:-1, 1:-1]
           - 2 * padded[:, 1:-1, 2:] + padded[:, 2:, :-2]
           - 2 * padded[:, 2:, 1:-1] + padded[:, 2:, 2:])
    t = lambda x: np.asarray(x.reshape(b, -1, 1024).sum(axis=2, dtype=jnp.int32),
                             np.int64).sum(axis=1)
    lap_flat = lap.reshape(b, -1)
    pad_n = (-lap_flat.shape[1]) % 1024
    if pad_n:
        lap_flat = jnp.pad(lap_flat, ((0, 0), (0, pad_n)))
        imm_flat = jnp.pad(jnp.abs(imm).reshape(b, -1), ((0, 0), (0, pad_n)))
    else:
        imm_flat = jnp.abs(imm).reshape(b, -1)
    return (np.asarray(jax.device_get(hist)), t(lap_flat),
            t(lap_flat * lap_flat), t(imm_flat))
