"""Fused per-image statistics kernel: the device half of the technical suite.

One jitted program computes, for a batch of same-shape RGB images, every
reduction the classical metric suite needs (reference formulas in
analyzers/technical.py:29-342). TPU-first formulation — no scatters, no
gathers (both are pathological on the VPU); everything is compare-reduce,
tiled integer sums and one MXU matmul:

- 256-bin gray histogram: two-level nibble one-hot matmul — the 16x16
  (gray>>4, gray&15) joint computed on the MXU IS the 256-bin histogram;
- saturation: tiled int32 partial sums (exact mean on host);
- Laplacian variance: reflect-101 3x3 stencil in int16 lanes, per-row /
  per-column-segment int32 partial sums (segment bounds keep int32 exact),
  host finishes in exact integer arithmetic;
- Immerkaer noise: same stencil trick, |response| partial sums;
- H-S joint entropy: the (180, N) x (N, 256) one-hot product IS the joint
  histogram, computed as a chunked bf16 matmul on the MXU with f32
  accumulation (counts < 2^24 stay exact) — with the S side RADIX-PACKED
  two bins per column ({0, 1, 4096} entries, unpacked exactly per
  sub-chunk), halving the dominant matmul's FLOPs; entropy reduced on
  device.

The public entry point `compute_batch_stats` groups arbitrary-shaped images
into (H, W) buckets with power-of-two batch padding so XLA compiles one
program per image shape, not per call.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.ops.colorspace import rgb_to_gray, rgb_to_hsv

# Per-tile int32 exactness bounds: |lap| <= 1020, lap^2 <= 1040400,
# |imm| <= 2040. Tile of 1024 keeps every partial < 2^31.
SUM_TILE = 1024
# lap^2 column-segment length: 2048 * 1040400 < 2^31 keeps segments exact
LAPSQ_SEG = 2048
# H-S one-hot matmul chunk (pixels per MXU step)
HS_CHUNK = 128 * 1024
# Radix-packed entropy sub-chunk: counts within a sub-chunk must stay below
# the 2^12 packing radix so the two fields of the f32 accumulator separate
# exactly (c0 + 4096*c1 <= 2048 + 4096*2048 < 2^24)
HS_SUBCHUNK = 2048
HS_RADIX = 4096.0
# Gray-histogram slice: per-slice f32 nibble-matmul counts stay exact below
# 2^24; 8M-pixel slices keep the one-hot working set bounded as well
_GRAY_HIST_SLICE = 8 * 1024 * 1024


@dataclass
class ImageStats:
    """Host-side view of one image's device statistics."""

    height: int
    width: int
    gray_hist: np.ndarray      # (256,) int32, exact counts
    sat_sum: int               # exact sum of S channel
    hs_entropy: float          # bits, f32 device reduction
    lap_sum: int               # exact sum of Laplacian responses
    lap_sumsq: int             # exact sum of squared responses
    imm_abs_sum: int           # exact sum of |Immerkaer| responses

    @property
    def n_pixels(self):
        return self.height * self.width

    # Exact float64 moments from the integer sums
    def laplacian_variance(self):
        n = self.n_pixels
        # exact integer arithmetic first; one float64 rounding at the end
        return float(self.lap_sumsq * n - self.lap_sum * self.lap_sum) / (n * n)

    def mean_saturation(self):
        return self.sat_sum / self.n_pixels / 255.0


def _pad_to_tiles(flat, tile):
    n = flat.shape[-1]
    padded = ((n + tile - 1) // tile) * tile
    if padded != n:
        flat = jnp.pad(flat, ((0, 0), (0, padded - n)))
    return flat


def _tiled_sum(x2d, tile=SUM_TILE):
    """(B, N) int32 -> (B, ntiles) int32 partial sums (each exact)."""
    return _pad_to_tiles(x2d, tile).reshape(x2d.shape[0], -1, tile).sum(
        axis=2, dtype=jnp.int32)


def _split_sum(partials, shift):
    """Exact int64-range reduction of int32 partials as TWO int32 scalars.

    Each partial p = (p >> shift) * 2^shift + (p & mask) (arithmetic shift,
    exact for negatives too); summing the hi and lo streams separately
    keeps both within int32. Per-family shifts bound both streams up to
    16k x 16k images: sat/lap/imm use 12 (partials <= ~3e7 over <= 512k
    tiles), lapsq uses 16 (partials <= 2^31 over <= 32k segments). The
    host recombines hi * 2^shift + lo in Python ints.

    Why: shrinks the device->host result from a per-tile array (~1 MB per
    batch-64) to 8 B per image — this harness's relay moves ~20 MB/s, so
    the tile arrays cost real milliseconds per step; on a real VM it still
    trims PCIe traffic and host-side summation work.
    """
    flat = partials.reshape(partials.shape[0], -1)
    hi = jnp.sum(flat >> shift, axis=1, dtype=jnp.int32)
    lo = jnp.sum(flat & ((1 << shift) - 1), axis=1, dtype=jnp.int32)
    return jnp.stack([hi, lo], axis=1)     # (B, 2)


def split_total(pair, shift):
    """Host side of _split_sum: (2,) int32 -> exact Python int."""
    return (int(pair[0]) << shift) + int(pair[1])


def hs_entropy_sorted(hh, ss, n_valid=None):
    """H-S joint entropy via sort + run-length scan (no histogram at all).

    Entropy needs only the multiset of joint-bin counts, so: combine each
    pixel's (hue, sat) into one code, sort each image's codes, find run
    starts, and get run lengths from the distance to the next run start (a
    reverse cummin scan — no scatters/gathers). O(N log N) sort work instead
    of the one-hot matmul's N x 46080 MACs. Padding pixels (code >= 46080)
    sort to the end and are excluded.

    MEASURED AND REJECTED on TPU v5e: the program never finished compiling
    within 30 minutes (lax.sort over 1.5M-element rows), vs 2.8 s compile /
    48.8 ms per batch-16 for the matmul formulation — see docs/PERF.md.
    Kept (CPU-correct to 3e-6 vs a numpy oracle) as the measured record.

    hh: (B, N) int32 hue bins 0..179 (or >=180/negative for padding)
    ss: (B, N) int32 saturation 0..255
    """
    b, n = hh.shape
    codes = jnp.where((hh >= 0) & (hh < 180), hh * 256 + ss, 180 * 256)
    codes = jax.lax.sort(codes, dimension=1)
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool), codes[:, 1:] != codes[:, :-1]], axis=1)
    start_pos = jnp.where(first, idx[None, :], n)
    # next run start at-or-after each position (reverse inclusive cummin)
    next_start = jnp.flip(jax.lax.associative_scan(
        jnp.minimum, jnp.flip(start_pos, 1), axis=1), 1)
    after = jnp.concatenate(
        [next_start[:, 1:], jnp.full((b, 1), n, jnp.int32)], axis=1)
    valid = codes < 180 * 256
    counts = jnp.where(first & valid, after - idx[None, :], 0)
    total = jnp.sum(counts, axis=1, keepdims=True).astype(jnp.float32)
    p = counts.astype(jnp.float32) / jnp.maximum(total, 1.0)
    return -jnp.sum(jnp.where(p > 0.0,
                              p * jnp.log2(jnp.where(p > 0.0, p, 1.0)), 0.0),
                    axis=1)


def hs_entropy_radix(hp, sp, pixel_subsample=1):
    """H-S joint entropy via the RADIX-PACKED one-hot MXU matmul.

    hp/sp: (B, n_pad) int32 hue bins / saturations with n_pad a multiple of
    HS_CHUNK; padding pixels carry hue -1 (or any value outside 0..179) so
    they land in no histogram bin. Returns (B,) f32 entropy in bits.

    This is the measured default formulation (decision table: docs/PERF.md);
    factored out of the fused statistics program so the perf probes and the
    fast-mode path time EXACTLY the shipped code.

    pixel_subsample > 1 is the config-gated FAST MODE: it strides the pixel
    stream (every k-th pixel feeds the histogram), trading an approximate
    histogram for proportionally less matmul/bandwidth work. The exact mode
    (subsample 1) is the parity-tested default.
    """
    if pixel_subsample > 1:
        hp = hp[:, ::pixel_subsample]
        sp = sp[:, ::pixel_subsample]
        hp = _pad_to_tiles(hp, HS_CHUNK)
        # padded hue entries must stay out-of-range; _pad_to_tiles zero-fills
        # so re-mark everything past the strided length
        n_strided = sp.shape[1]
        sp = _pad_to_tiles(sp, HS_CHUNK)
        if hp.shape[1] != n_strided:
            mask = jnp.arange(hp.shape[1]) >= n_strided
            hp = jnp.where(mask[None, :], -1, hp)
    nchunks = hp.shape[1] // HS_CHUNK
    nsub = HS_CHUNK // HS_SUBCHUNK
    h_bins = jnp.arange(180, dtype=jnp.int32)
    sh_bins = jnp.arange(128, dtype=jnp.int32)

    def per_image(rows):
        h_row, s_row = rows

        def body(acc, ci):
            start = ci * HS_CHUNK
            hc = jax.lax.dynamic_slice(h_row, (start,), (HS_CHUNK,))
            sc = jax.lax.dynamic_slice(s_row, (start,), (HS_CHUNK,))
            hc = hc.reshape(nsub, HS_SUBCHUNK)
            sc = sc.reshape(nsub, HS_SUBCHUNK)
            oh_h = (hc[:, :, None] == h_bins[None, None, :]).astype(
                jnp.bfloat16)
            weight = jnp.where((sc & 1) == 1, HS_RADIX, 1.0).astype(
                jnp.bfloat16)
            packed_s = ((sc >> 1)[:, :, None] == sh_bins[None, None, :]
                        ).astype(jnp.bfloat16) * weight[:, :, None]
            # batched over sub-chunks: (nsub, 180, 128) f32, exact
            packed = jax.lax.dot_general(
                oh_h, packed_s, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            c_odd = jnp.floor(packed * (1.0 / HS_RADIX))
            c_even = packed - c_odd * HS_RADIX
            # keep separate even/odd accumulators across the scan — the
            # field interleave happens ONCE at the end, not per chunk
            # (measured: the per-chunk interleave costs ~0.15 ms/img)
            ae, ao = acc
            return (ae + c_even.sum(0), ao + c_odd.sum(0)), None

        (acc_e, acc_o), _ = jax.lax.scan(
            body, (jnp.zeros((180, 128), jnp.float32),
                   jnp.zeros((180, 128), jnp.float32)), jnp.arange(nchunks))
        hist2d = jnp.stack([acc_e, acc_o], axis=-1).reshape(180, 256)
        prob = hist2d / jnp.sum(hist2d)
        return -jnp.sum(jnp.where(prob > 0,
                                  prob * jnp.log2(jnp.where(prob > 0, prob, 1.0)),
                                  0.0))

    return jax.lax.map(per_image, (hp, sp))


def _batch_stats_impl(rgb_batch, hs_subsample=1, entropy_impl="xla"):
    """(B, H, W, 3) uint8 -> device stats tuple.

    The histogram/stencil formulations are the measured defaults (decision
    table: docs/PERF.md). The pallas gray-stats kernel (ops/pallas_stats.py)
    compiles 15x faster standalone but degrades XLA's scheduling ~20x when
    embedded here; the sort-based entropy (hs_entropy_sorted below) never
    finished compiling on v5e.

    entropy_impl selects the H-S joint-entropy path: "xla" (the radix-packed
    one-hot matmul, hs_entropy_radix), "pallas" (the ILP kernel,
    ops/pallas_entropy.hs_entropy_pallas_ilp — measured 1.55x faster
    standalone in round 4), or "none" (entropy returned as zeros; the caller
    runs it as a separate device program so kernel and XLA program compile
    independently).

    hs_subsample > 1 is the config-gated FAST MODE (default off,
    processing.fast_color_harmony): the H-S joint entropy — the single most
    expensive statistic — is computed from every k-th pixel; every other
    statistic stays exact. docs/SCORING.md records the measured score
    deltas."""
    b, h, w, _ = rgb_batch.shape
    n = h * w
    gray = rgb_to_gray(rgb_batch)

    # --- ONE-PASS pallas kernel (round 5): gray hist + HSV + saturation +
    # entropy computed from the uint8 planes in a single HBM pass
    # (ops/pallas_fused_stats.py). Only the stencils (2-D neighborhoods)
    # and pHash (DCT) stay XLA-side below. Exact-mode only: the fast
    # tier's entropy stride keeps the split paths.
    fused_kernel = entropy_impl == "pallas_fused" and hs_subsample == 1
    if entropy_impl == "pallas_fused" and not fused_kernel:
        entropy_impl = "pallas"      # fast tier: stride via the ILP kernel
    if fused_kernel:
        from facet_tpu.ops.pallas_fused_stats import fused_stats_pallas

        # the kernel already returns saturation as the (hi, lo) split
        # pair split_total(…, 12) recombines — int32-exact past 16 MP
        # where a single int32 total would wrap
        entropy, gray_hist, sat_tiles = fused_stats_pallas(rgb_batch)
    else:
        hh, ss, _ = rgb_to_hsv(rgb_batch)

        # --- saturation partial sums
        sat_tiles = _split_sum(_tiled_sum(ss.reshape(b, -1)), 12)

        # --- gray histogram: two-level (hi, lo) nibble one-hot matmul.
        # counts[g] = counts2d[g >> 4, g & 15]: the 16x16 joint of the two
        # nibbles IS the 256-bin histogram, needing only 32 one-hot
        # compares per pixel (vs 256 for direct compare-reduce) plus a
        # tiny MXU product. Measured 2.7x faster than compare-reduce at
        # 1.5 MP (docs/PERF.md). Per-slice f32 counts stay exact (slice
        # < 2^24 pixels); cross-slice accumulation is int32, so any image
        # size is exact.
        gflat = gray.reshape(b, -1)
        nib = jnp.arange(16, dtype=jnp.int32)
        gray_hist = jnp.zeros((b, 256), jnp.int32)
        for start in range(0, n, _GRAY_HIST_SLICE):
            gpart = gflat[:, start:start + _GRAY_HIST_SLICE]
            oh_hi = ((gpart >> 4)[:, :, None] == nib[None, None, :]).astype(
                jnp.bfloat16)
            oh_lo = ((gpart & 15)[:, :, None] == nib[None, None, :]).astype(
                jnp.bfloat16)
            c2 = jax.lax.dot_general(
                oh_hi, oh_lo, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            gray_hist = gray_hist + c2.reshape(b, 256).astype(jnp.int32)

    # --- 3x3 stencils with reflect-101 borders (cv2 default), int16 lanes.
    # gray <= 255 bounds |lap| <= 1020 and |imm| <= 2040, and every
    # left-to-right evaluation intermediate stays within int16 (the largest
    # |prefix coefficient| is 4 -> 1020). int16 halves the stencil traffic:
    # measured 2.7x faster than the int32 flatten+tile form (docs/PERF.md).
    p = jnp.pad(gray.astype(jnp.int16), ((0, 0), (1, 1), (1, 1)),
                mode="reflect")
    lap = (p[:, :-2, 1:-1] + p[:, 2:, 1:-1] + p[:, 1:-1, :-2]
           + p[:, 1:-1, 2:] - 4 * p[:, 1:-1, 1:-1])
    imm = (p[:, :-2, :-2] - 2 * p[:, :-2, 1:-1] + p[:, :-2, 2:]
           - 2 * p[:, 1:-1, :-2] + 4 * p[:, 1:-1, 1:-1] - 2 * p[:, 1:-1, 2:]
           + p[:, 2:, :-2] - 2 * p[:, 2:, 1:-1] + p[:, 2:, 2:])
    lap32 = lap.astype(jnp.int32)
    # per-row int32 partials are exact: W * 1020 < 2^31 for any real width
    lap_tiles = jnp.sum(lap32, axis=2, dtype=jnp.int32)
    imm_tiles = jnp.sum(jnp.abs(imm).astype(jnp.int32), axis=2,
                        dtype=jnp.int32)
    # lap^2 <= 1040400: column segments of <= 2048 stay int32-exact
    sq = lap32 * lap32
    wpad = ((w + LAPSQ_SEG - 1) // LAPSQ_SEG) * LAPSQ_SEG
    if wpad != w:
        sq = jnp.pad(sq, ((0, 0), (0, 0), (0, wpad - w)))
    lapsq_tiles = jnp.sum(sq.reshape(b, h, -1, LAPSQ_SEG), axis=3,
                          dtype=jnp.int32)

    # --- H-S joint entropy via RADIX-PACKED one-hot matmul.
    # hist2d[h, s] is still an exact one-hot product, but the S side packs
    # each EVEN/ODD bin pair into one column: the packed operand holds 1 for
    # an even bin, 4096 for the odd partner (entries {0, 1, 4096} — every
    # one exactly representable in bf16, since 4096 = 2^12 and a pixel's S
    # hits exactly one bin of the pair). The f32 MXU accumulator of a
    # 2048-pixel sub-chunk is then c_even + 4096 * c_odd with both counts
    # <= 2048 < 4096, so an exact power-of-two floor-divide separates the
    # fields. This HALVES the matmul FLOPs (2*N*180*128 vs 2*N*180*256)
    # while keeping the packed operand at exactly 128 lanes. Measured: the
    # op is OUTPUT-TILE-bound, not FLOP-bound — 3.26 ms/img packed vs 3.29
    # unpacked at 1.5 MP — so the win is budget headroom, not wall-clock;
    # every other formulation (int8 / pallas / sort / chunk sweeps /
    # per-chunk interleave) measured equal or worse. Decision table:
    # docs/PERF.md. The formulation lives in hs_entropy_radix so the perf
    # probes and the config-gated fast mode exercise the identical code.
    if not fused_kernel:
        hp = _pad_to_tiles(hh.reshape(b, -1), HS_CHUNK) if n % HS_CHUNK else hh.reshape(b, -1)
        sp = _pad_to_tiles(ss.reshape(b, -1), HS_CHUNK) if n % HS_CHUNK else ss.reshape(b, -1)
        if hp.shape[1] != n:
            # mark padding as out-of-range so it lands in no bin
            pad_mask = jnp.arange(hp.shape[1]) >= n
            hp = jnp.where(pad_mask[None, :], -1, hp)
        if entropy_impl == "zero":
            # measurement floor: the whole entropy stage elided
            entropy = jnp.zeros((b,), jnp.float32)
        elif entropy_impl == "none":
            # the caller computes entropy in a separate program from
            # (hh, ss); returning them lets it avoid recomputing the HSV
            entropy = (hp[:, ::hs_subsample], sp[:, ::hs_subsample])
        elif entropy_impl == "pallas":
            from facet_tpu.ops.pallas_entropy import hs_entropy_pallas_ilp

            entropy = hs_entropy_pallas_ilp(hp[:, ::hs_subsample],
                                            sp[:, ::hs_subsample])
        else:
            entropy = hs_entropy_radix(hp, sp, pixel_subsample=hs_subsample)

    return (gray_hist, sat_tiles, entropy,
            _split_sum(lap_tiles, 12), _split_sum(lapsq_tiles, 16),
            _split_sum(imm_tiles, 12))


_batch_stats = jax.jit(_batch_stats_impl,
                       static_argnames=("hs_subsample", "entropy_impl"))


def resolve_entropy_impl(impl="auto"):
    """Pick the H-S entropy implementation for the current backend.

    "auto" -> "pallas" on TPU (the packed ILP kernel measured 1.58 ->
    0.45 ms/img of device time and +34% on the fused member, docs/PERF.md
    round 4), "xla" on CPU (the pallas kernel would run interpreted).
    FACET_ENTROPY_IMPL overrides for measurement/debugging.
    """
    import os

    impl = os.environ.get("FACET_ENTROPY_IMPL", impl)
    if impl != "auto":
        return impl
    return "xla" if jax.default_backend() == "cpu" else "pallas"


def _bucket_size(n):
    """Pad batch to a power of two (capped) to bound recompilation."""
    size = 1
    while size < n:
        size *= 2
    return min(size, 256)


def compute_batch_stats(images, hs_subsample=1, entropy_impl="auto"):
    """Compute device statistics for a list of RGB uint8 numpy arrays.

    Images are grouped by (H, W) so each distinct shape compiles once; the
    batch dimension is padded to powers of two. Returns a list of ImageStats
    aligned with the input order.
    """
    entropy_impl = resolve_entropy_impl(entropy_impl)
    results = [None] * len(images)
    by_shape = {}
    for i, img in enumerate(images):
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(f"image {i}: expected (H, W, 3) RGB, got {img.shape}")
        if img.shape[0] < 3 or img.shape[1] < 3:
            raise ValueError(f"image {i}: too small for 3x3 stencils: {img.shape}")
        by_shape.setdefault(img.shape[:2], []).append(i)

    for (h, w), indices in by_shape.items():
        pos = 0
        while pos < len(indices):
            chunk = indices[pos:pos + 256]
            padded_n = _bucket_size(len(chunk))
            batch = np.zeros((padded_n, h, w, 3), np.uint8)
            for j, idx in enumerate(chunk):
                batch[j] = images[idx]
            gray_h, sat_t, entropy, lap_t, lapsq_t, imm_t = jax.device_get(
                _batch_stats(jnp.asarray(batch), hs_subsample=hs_subsample,
                             entropy_impl=entropy_impl))
            for j, idx in enumerate(chunk):
                results[idx] = ImageStats(
                    height=h,
                    width=w,
                    gray_hist=np.asarray(gray_h[j]),
                    sat_sum=split_total(sat_t[j], 12),
                    hs_entropy=float(entropy[j]),
                    lap_sum=split_total(lap_t[j], 12),
                    lap_sumsq=split_total(lapsq_t[j], 16),
                    imm_abs_sum=split_total(imm_t[j], 12),
                )
            pos += len(chunk)
    return results
