"""Pallas TPU kernel: ALL pixel-stream statistics in one HBM pass.

Round-5 successor to the ILP entropy kernel (ops/pallas_entropy.py). The
round-4 stage attribution (docs/PERF.md "Fused-member stage attribution")
priced the non-ViT stats at 1.51 ms/img: entropy 0.66 (0.45 device time
inside the ILP kernel), gray histogram 0.25, HSV conversion 0.21,
saturation + glue ~0.2. Everything except the stencils/pHash is
pixel-stream math with tiny outputs — so ONE kernel that reads the uint8
channel planes once and computes, per block, in VMEM:

- exact cv2 gray        (ops/colorspace.rgb_to_gray fixed-point formula)
- exact cv2 H, S        (the hsv_shift=12 reciprocal formulation with
                         f32-estimate + int32-correction rounded divides)
- the 256-bin gray histogram as a nibble one-hot MXU dot
  ((16, K) x (128, K) -> (16, 128), cols >= 16 provably zero)
- the saturation sum    (int32 (hi, lo) split accumulation, exact
                         past the >16 MP point a single int32 wraps)
- the H-S joint entropy (the round-4 ILP recipe verbatim: 4 independent
  K-split accumulator chains, radix-packed S columns {0, 1, 4096})

kills the XLA-side HSV/one-hot materializations (hh+ss alone are
~12 MB/img of HBM int32 traffic) instead of just the entropy's.

INPUT PACKING (measured round 5): the channel planes travel as int32
with FOUR uint8 pixels bitcast into each lane. Three rejected layouts
taught why: int32 planes cost a 6.75 GB HBM materialization at batch
384 (the difference between OOM and fit); raw uint8 blocks force (32,
128) tiling whose 32-row unrolled loop blows the 16 MB scoped-VMEM
stack (72.7 MB measured); dynamic_slice on VMEM *values* has no Mosaic
lowering. Packed int32 keeps the proven (8, CHUNK) block shape and the
uint8 HBM footprint; the kernel unpacks bytes with shifts (order
irrelevant — every statistic here is pixel-order-invariant).

The stencils (Laplacian/Immerkaer) and pHash stay in XLA: they need the
2-D neighborhood / DCT structure, their int16 formulation is already
near-floor (0.15 ms/img), and they reuse the gray plane XLA computes for
pHash anyway.

Block-padding pixels are masked by their static flat index (>= n_valid):
hue is forced out of range (hits no bin), the gray/sat contributions are
zeroed. Exactness holds at LIBRARY photo sizes, not just bench inputs
(round-5 review finding): per-block f32 dot accumulators stay exact
(every per-block count <= 262,144 pixels < 2^24) and the cross-block
scratch accumulators are int32 (bins bounded by the pixel count, < 2^31
up to 16k x 16k); the saturation total (up to 255 * n, > 2^31 for a
>16 MP image) crosses blocks as the same (hi, lo) = (>>12, &4095) split
pair ops/stats._split_sum uses, recombined host-side by split_total.

tests/test_pallas_fused_stats.py pins interpret-mode parity against the
XLA formulation (identical histograms, sat sums, and entropy to 1e-5).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 8192
ROWS = 8          # int32 block sublanes — the entropy kernel's proven shape
PACK = 4          # uint8 pixels per int32 lane
H_PAD = 192       # 180 hue bins padded to the bf16 sublane tile
SPLITS = 4        # independent MXU accumulator chains (round-4 recipe)
_HSV_SHIFT = 12
_HALF = 1 << (_HSV_SHIFT - 1)


def _round_div_f32(a, b):
    """Exact round-half-up(a / b) for positive int32 (colorspace.py)."""
    q = jnp.floor(a / b.astype(jnp.float32) + 0.5).astype(jnp.int32)
    num = 2 * a + b
    for _ in range(2):
        r = num - 2 * b * q
        q = q + jnp.where(r < 0, -1, 0) + jnp.where(r >= 2 * b, 1, 0)
    return q


def _make_kernel(n_valid):
    sub = CHUNK // SPLITS
    assert sub <= 2048        # exact {0,1,4096} radix unpacking bound

    def _kernel(r_ref, g_ref, b_ref, ent_ref, hist_ref, sat_ref,
                acc_hs, acc_gray, acc_sat):
        # scratch: acc_hs/acc_gray int32 (per-block f32 partials are
        # exact; int32 cross-block sums stay exact where f32 would stop
        # counting past 2^24), acc_sat an int32 (hi, lo) split pair
        bi = pl.program_id(0)
        ci = pl.program_id(1)
        nblocks = pl.num_programs(1)

        @pl.when(ci == 0)
        def _():
            acc_hs[:] = jnp.zeros_like(acc_hs)
            acc_gray[:] = jnp.zeros_like(acc_gray)
            acc_sat[0, 0] = 0
            acc_sat[0, 1] = 0

        hue_ids = jax.lax.broadcasted_iota(jnp.int32, (H_PAD, 1), 0)
        pk_ids = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        nib_ids = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        def row_body(row, carry):
            # fori_loop over block rows (NOT an unrolled Python loop: 32
            # unrolled streams keep every one-hot temporary live at once
            # and blow the scoped-VMEM stack). The carried accumulators
            # preserve the ILP structure — each split's dot chains only
            # to ITS accumulator across iterations.
            hs_accs, gray_acc, sat_acc = carry
            r32 = r_ref[pl.ds(row, 1), :]                     # (1, CHUNK)
            g32 = g_ref[pl.ds(row, 1), :]
            b32 = b_ref[pl.ds(row, 1), :]
            base = (ci * ROWS + row) * CHUNK
            for k in range(PACK):                 # static byte fields
                r = (r32 >> (8 * k)) & 255
                g = (g32 >> (8 * k)) & 255
                b = (b32 >> (8 * k)) & 255
                # lane l of this row holds pixels PACK*(base + l) + k
                valid = (PACK * (base + lane) + k) < n_valid

                # ---- exact cv2 gray + its two-nibble one-hot dot
                gray = (r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15
                oh_hi = (nib_ids == jnp.where(valid, gray >> 4, -1)).astype(
                    jnp.bfloat16)                             # (16, K)
                oh_lo = (pk_ids == (gray & 15)).astype(jnp.bfloat16)
                gray_acc = gray_acc + jax.lax.dot_general(
                    oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

                # ---- exact cv2 HSV (S and H only; V is max)
                v = jnp.maximum(jnp.maximum(r, g), b)
                vmin = jnp.minimum(jnp.minimum(r, g), b)
                diff = v - vmin
                v_safe = jnp.maximum(v, 1)
                sdiv = _round_div_f32(255 << _HSV_SHIFT, v_safe)
                s = (diff * jnp.where(v > 0, sdiv, 0) + _HALF) >> _HSV_SHIFT
                d_safe = jnp.maximum(diff, 1)
                hdiv = _round_div_f32(180 << _HSV_SHIFT, 6 * d_safe)
                h_num = jnp.where(
                    v == r, g - b,
                    jnp.where(v == g, (b - r) + 2 * diff,
                              (r - g) + 4 * diff))
                h = (h_num * jnp.where(diff > 0, hdiv, 0)
                     + _HALF) >> _HSV_SHIFT
                h = jnp.where(h < 0, h + 180, h)

                sat_acc = sat_acc + jnp.sum(jnp.where(valid, s, 0))

                # ---- H-S entropy dots: the ILP packed recipe verbatim
                h_row = jnp.where(valid, h, 255)  # padding hits no hue row
                oh_ht = (hue_ids == h_row).astype(jnp.bfloat16)
                weight = jnp.where((s & 1) == 1, 4096.0, 1.0).astype(
                    jnp.bfloat16)
                oh_st = ((pk_ids == (s >> 1)).astype(jnp.bfloat16)
                         * weight)                             # (128, K)
                new_accs = []
                for j in range(SPLITS):
                    a = jax.lax.dot_general(
                        oh_ht[:, j * sub:(j + 1) * sub],
                        oh_st[:, j * sub:(j + 1) * sub],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    c_odd = jnp.floor(a * (1.0 / 4096.0))
                    c_even = a - c_odd * 4096.0
                    new_accs.append(hs_accs[j] + jnp.concatenate(
                        [c_even, c_odd], axis=1))
                hs_accs = tuple(new_accs)
            return hs_accs, gray_acc, sat_acc

        init = (tuple(jnp.zeros((H_PAD, 256), jnp.float32)
                      for _ in range(SPLITS)),
                jnp.zeros((16, 128), jnp.float32), jnp.int32(0))
        hs_accs, gray_acc, sat_acc = jax.lax.fori_loop(
            0, ROWS, row_body, init)

        total = hs_accs[0]
        for j in range(1, SPLITS):
            total = total + hs_accs[j]
        acc_hs[:] += total.astype(jnp.int32)
        acc_gray[:] += gray_acc.astype(jnp.int32)
        # per-block sat sum <= 255 * 262,144 < 2^31; the split streams
        # stay int32-exact to 16k x 16k (hi <= ~16.3k/block)
        acc_sat[0, 0] += sat_acc >> 12
        acc_sat[0, 1] += sat_acc & ((1 << 12) - 1)

        @pl.when(ci == nblocks - 1)
        def _():
            counts = acc_hs[:].astype(jnp.float32)
            p = counts * (1.0 / jnp.sum(counts))
            logp = jnp.where(p > 0.0,
                             jnp.log2(jnp.where(p > 0.0, p, 1.0)), 0.0)
            ent_ref[bi, 0] = -jnp.sum(p * logp)
            hist_ref[0] = acc_gray[:]
            sat_ref[bi, 0] = acc_sat[0, 0]
            sat_ref[bi, 1] = acc_sat[0, 1]

    return _kernel


@functools.partial(jax.jit, static_argnames=("n_valid", "interpret"))
def _fused_stats_call(rp, gp, bp, n_valid, interpret=False):
    """rp/gp/bp: (B, n_pad4) int32 planes with PACK uint8 pixels per lane,
    n_pad4 % (ROWS*CHUNK) == 0.
    -> (entropy (B,), gray_hist (B, 256) int32,
        sat_pair (B, 2) int32 — (>>12, &4095) split, split_total(…, 12)
        recombines)."""
    b, n_pad4 = rp.shape
    nblocks = n_pad4 // (ROWS * CHUNK)
    rows_total = b * n_pad4 // CHUNK
    rp = rp.reshape(rows_total, CHUNK)
    gp = gp.reshape(rows_total, CHUNK)
    bp = bp.reshape(rows_total, CHUNK)
    spec = pl.BlockSpec((ROWS, CHUNK), lambda b_, c: (b_ * nblocks + c, 0))
    ent, hist, sat = pl.pallas_call(
        _make_kernel(n_valid),
        grid=(b, nblocks),
        in_specs=[spec, spec, spec],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16, 128), lambda b_, c: (b_, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((H_PAD, 256), jnp.int32),
                        pltpu.VMEM((16, 128), jnp.int32),
                        pltpu.SMEM((1, 2), jnp.int32)],
        out_shape=[jax.ShapeDtypeStruct((b, 1), jnp.float32),
                   jax.ShapeDtypeStruct((b, 16, 128), jnp.int32),
                   jax.ShapeDtypeStruct((b, 2), jnp.int32)],
        interpret=interpret,
    )(rp, gp, bp)
    gray_hist = hist[:, :, :16].reshape(b, 256)
    return ent[:, 0], gray_hist, sat


def fused_stats_pallas(rgb_batch, interpret=None):
    """(B, H, W, 3) uint8 -> (entropy (B,) f32, gray_hist (B, 256) i32,
    sat_pair (B, 2) i32 split sums), all exact cv2 parity, one HBM pass.

    interpret=None auto-selects interpreter mode on CPU backends (tests,
    multichip dryrun) like the entropy kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, w, _ = rgb_batch.shape
    n = h * w
    block_px = ROWS * CHUNK * PACK
    n_pad = -(-n // block_px) * block_px
    planes = jnp.moveaxis(rgb_batch, 3, 1).reshape(b, 3, n)   # stays uint8
    if n_pad != n:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, n_pad - n)))
    # bitcast PACK consecutive uint8 pixels into each int32 lane: uint8
    # HBM footprint, int32 (8, 128) VMEM tiling in the kernel
    packed = jax.lax.bitcast_convert_type(
        planes.reshape(b, 3, n_pad // PACK, PACK), jnp.int32)
    return _fused_stats_call(packed[:, 0], packed[:, 1], packed[:, 2],
                             int(n), interpret)
