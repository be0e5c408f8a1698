#!/usr/bin/env python3
"""Probe: embed the pallas gray-stats kernel in the fused program (round 4).

Round 1 rejected embedding ops/pallas_stats.py in the fused program (~240 s
compile, ~20x slower end-to-end); round 4 then found that finding does NOT
generalize — the ILP entropy kernel embeds at full speed. The stage
attribution (tools/probe_fused_stages.py) puts the gray histogram at
0.25 ms/img and the stencils at 0.15 inside the fused program, both over
VMEM-size data the kernel covers in one double-buffered pass. Re-probe the
embedding with the round-4 program (pallas entropy already inside).

Variants (full shipped pipeline body, b64 at 1.5 MP):
  xla          shipped: nibble-matmul hist + int16 stencils   (baseline)
  pallas_gray  hist + stencils replaced by _pallas_gray_stats (2nd kernel
               in the program, after the ILP entropy)

Checks hist/lap/lapsq/imm exactness between the two variants before timing.
Usage: python tools/probe_pallas_gray_embed.py [logfile] [batch]
"""

import sys
import time

import numpy as np

LOG = open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pallas_gray_embed.log",
           "a", buffering=1)


def say(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


def build(vision, head, src_h, src_w, gray_impl):
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.clip import CLIP_MEAN, CLIP_STD
    from facet_tpu.ops import stats as S
    from facet_tpu.ops.colorspace import rgb_to_gray, rgb_to_hsv
    from facet_tpu.ops.pallas_entropy import hs_entropy_pallas_ilp
    from facet_tpu.ops.phash import HASH_SIZE, RESIZE, _area_weights, _dct_matrix
    from facet_tpu.ops.resize import clip_preprocess_matrices

    target = vision.config.image_size
    rows, cols = clip_preprocess_matrices(src_h, src_w, target)
    rows, cols = jnp.asarray(rows), jnp.asarray(cols)
    hash_rows = jnp.asarray(_area_weights(src_h, RESIZE))
    hash_cols = jnp.asarray(_area_weights(src_w, RESIZE))
    dct = jnp.asarray(_dct_matrix())

    def pipeline(vp, hp, batch_u8):
        b, h, w, _ = batch_u8.shape
        n = h * w
        out = {}
        gray = rgb_to_gray(batch_u8)
        hh, ss, _ = rgb_to_hsv(batch_u8)
        out["sat"] = S._split_sum(S._tiled_sum(ss.reshape(b, -1)), 12)

        if gray_impl == "pallas":
            from facet_tpu.ops.pallas_stats import _pallas_gray_stats

            padded = jnp.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="reflect")
            hist, sums = _pallas_gray_stats(padded)
            out["hist"] = hist
            s64 = jnp.sum(sums.astype(jnp.int64), axis=1)
            out["lap_sum"] = s64[:, 0]
            out["lap_sumsq"] = (s64[:, 2] << 20) + s64[:, 1]
            out["imm_abs"] = s64[:, 3]
        else:
            gflat = gray.reshape(b, -1)
            nib = jnp.arange(16, dtype=jnp.int32)
            gray_hist = jnp.zeros((b, 256), jnp.int32)
            for start in range(0, n, S._GRAY_HIST_SLICE):
                gpart = gflat[:, start:start + S._GRAY_HIST_SLICE]
                oh_hi = ((gpart >> 4)[:, :, None] == nib[None, None, :]
                         ).astype(jnp.bfloat16)
                oh_lo = ((gpart & 15)[:, :, None] == nib[None, None, :]
                         ).astype(jnp.bfloat16)
                c2 = jax.lax.dot_general(
                    oh_hi, oh_lo, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                gray_hist = gray_hist + c2.reshape(b, 256).astype(jnp.int32)
            out["hist"] = gray_hist
            p = jnp.pad(gray.astype(jnp.int16), ((0, 0), (1, 1), (1, 1)),
                        mode="reflect")
            lap = (p[:, :-2, 1:-1] + p[:, 2:, 1:-1] + p[:, 1:-1, :-2]
                   + p[:, 1:-1, 2:] - 4 * p[:, 1:-1, 1:-1])
            imm = (p[:, :-2, :-2] - 2 * p[:, :-2, 1:-1] + p[:, :-2, 2:]
                   - 2 * p[:, 1:-1, :-2] + 4 * p[:, 1:-1, 1:-1]
                   - 2 * p[:, 1:-1, 2:] + p[:, 2:, :-2]
                   - 2 * p[:, 2:, 1:-1] + p[:, 2:, 2:])
            lap32 = lap.astype(jnp.int32)
            lap_tiles = jnp.sum(lap32, axis=2, dtype=jnp.int32)
            imm_tiles = jnp.sum(jnp.abs(imm).astype(jnp.int32), axis=2,
                                dtype=jnp.int32)
            sq = lap32 * lap32
            wpad = ((w + S.LAPSQ_SEG - 1) // S.LAPSQ_SEG) * S.LAPSQ_SEG
            if wpad != w:
                sq = jnp.pad(sq, ((0, 0), (0, 0), (0, wpad - w)))
            lapsq_tiles = jnp.sum(sq.reshape(b, h, -1, S.LAPSQ_SEG), axis=3,
                                  dtype=jnp.int32)
            out["lap_sum"] = jnp.sum(lap_tiles.astype(jnp.int64), axis=1)
            out["lap_sumsq"] = jnp.sum(
                sq.astype(jnp.int64).reshape(b, -1), axis=1)
            out["imm_abs"] = jnp.sum(imm_tiles.astype(jnp.int64), axis=1)

        hp_ = (S._pad_to_tiles(hh.reshape(b, -1), S.HS_CHUNK)
               if n % S.HS_CHUNK else hh.reshape(b, -1))
        sp_ = (S._pad_to_tiles(ss.reshape(b, -1), S.HS_CHUNK)
               if n % S.HS_CHUNK else ss.reshape(b, -1))
        if hp_.shape[1] != n:
            pad_mask = jnp.arange(hp_.shape[1]) >= n
            hp_ = jnp.where(pad_mask[None, :], -1, hp_)
        out["entropy"] = hs_entropy_pallas_ilp(hp_, sp_)

        gf = gray.astype(jnp.float32)
        small = jnp.einsum("rh,bhw,cw->brc", hash_rows, gf, hash_cols)
        freq = dct @ small @ dct.T
        low = freq[:, :HASH_SIZE, :HASH_SIZE].reshape(-1, HASH_SIZE * HASH_SIZE)
        med = jnp.median(low, axis=1, keepdims=True)
        out["hash_bits"] = low > med

        fbatch = batch_u8.astype(jnp.float32)
        crops = jnp.einsum("rh,bhwc->brwc", rows, fbatch)
        crops = jnp.einsum("sw,brwc->brsc", cols, crops)
        x = (crops / 255.0 - CLIP_MEAN) / CLIP_STD
        features = vision.apply(vp, x)
        raw = head.apply(hp, features)[:, 0]
        out["aesthetic"] = jnp.clip((raw + 1.0) * 5.0, 0.0, 10.0)
        return out

    import jax

    return jax.jit(pipeline)


def main():
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.aesthetic import AestheticHead
    from facet_tpu.models.checkpoints import fallback_init, sds
    from facet_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    H, W = 1024, 1536
    say(f"devices={jax.devices()} batch={B}")

    config = CLIPVisionConfig()
    vision = CLIPVisionTower(config, dtype=jnp.bfloat16)
    head = AestheticHead()
    vp = fallback_init(
        vision, sds((1, config.image_size, config.image_size, 3)), seed=0)
    hp = fallback_init(head, sds((1, config.projection_dim)), seed=1)

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (1, H, W, 3), dtype=np.uint8))
    buf = jax.jit(lambda f: jnp.tile(f, (B, 1, 1, 1)))(frame)
    buf.block_until_ready()
    say("source buffer resident")

    ref = None
    for name in ("xla", "pallas"):
        fn = build(vision, head, H, W, name)
        t0 = time.time()
        out = jax.device_get(fn(vp, hp, buf))
        compile_s = time.time() - t0
        if ref is None:
            ref = out
            exact = "baseline"
        else:
            bad = [k for k in ("hist", "lap_sum", "lap_sumsq", "imm_abs")
                   if not np.array_equal(np.asarray(out[k]),
                                         np.asarray(ref[k]))]
            exact = "EXACT" if not bad else f"MISMATCH {bad}"
        best = 0.0
        for _ in range(2):
            iters, t0 = 4, time.time()
            for _ in range(iters):
                jax.device_get(fn(vp, hp, buf))
            best = max(best, iters * B / (time.time() - t0))
        say(f"{name:8s} {best:7.1f} img/s  {1000.0 / best:5.2f} ms/img"
            f"  compile {compile_s:6.1f}s  {exact}")


if __name__ == "__main__":
    main()
