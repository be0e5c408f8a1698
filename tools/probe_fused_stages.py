#!/usr/bin/env python3
"""Attribute the fused member's per-stage device cost (round 4).

docs/PERF.md's round-4 state: fused member ~2.98 ms/img at b256 with the
pallas ILP entropy; entropy-elided floor 2.65 ms/img (b64). This probe
breaks the floor down by eliding one stage at a time from a probe-local
copy of the fused pipeline body (XLA dead-code-eliminates whatever the
variant doesn't return):

  full        everything (pallas entropy)         = shipped TPU program
  no_entropy  entropy zeroed                      = the known 2.65 floor
  no_hist     gray histogram elided
  no_stencils Laplacian/Immerkaer stencils elided
  no_hsv      saturation + entropy elided (the HSV conversion DCEs away)
  no_phash    pHash elided
  vit_only    only resize + ViT + aesthetic head
  stats_only  everything except ViT/head

Same harness discipline as the other round-4 probes (fallback_init, one
TPU process at a time, tile-replicated resident buffer). Usage:
  python tools/probe_fused_stages.py [logfile] [batch]
"""

import sys
import time

import numpy as np

LOG = open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fused_stages_probe.log",
           "a", buffering=1)


def say(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


def build_variant(vision, head, src_h, src_w, stages):
    """Probe-local mirror of device_pipeline.build_fused_pipeline with
    per-stage toggles; `stages` is a set over
    {hist, stencils, sat, entropy, phash, vit}."""
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.clip import CLIP_MEAN, CLIP_STD
    from facet_tpu.ops import stats as S
    from facet_tpu.ops.colorspace import rgb_to_gray, rgb_to_hsv
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

        if "sat" in stages or "entropy" in stages:
            hh, ss, _ = rgb_to_hsv(batch_u8)
        if "sat" in stages:
            out["sat"] = S._split_sum(S._tiled_sum(ss.reshape(b, -1)), 12)

        if "hist" in stages:
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

        if "stencils" in stages:
            p = jnp.pad(gray.astype(jnp.int16), ((0, 0), (1, 1), (1, 1)),
                        mode="reflect")
            lap = (p[:, :-2, 1:-1] + p[:, 2:, 1:-1] + p[:, 1:-1, :-2]
                   + p[:, 1:-1, 2:] - 4 * p[:, 1:-1, 1:-1])
            imm = (p[:, :-2, :-2] - 2 * p[:, :-2, 1:-1] + p[:, :-2, 2:]
                   - 2 * p[:, 1:-1, :-2] + 4 * p[:, 1:-1, 1:-1]
                   - 2 * p[:, 1:-1, 2:] + p[:, 2:, :-2]
                   - 2 * p[:, 2:, 1:-1] + p[:, 2:, 2:])
            lap32 = lap.astype(jnp.int32)
            out["lap"] = S._split_sum(
                jnp.sum(lap32, axis=2, dtype=jnp.int32), 12)
            out["imm"] = S._split_sum(
                jnp.sum(jnp.abs(imm).astype(jnp.int32), axis=2,
                        dtype=jnp.int32), 12)
            sq = lap32 * lap32
            wpad = ((w + S.LAPSQ_SEG - 1) // S.LAPSQ_SEG) * S.LAPSQ_SEG
            if wpad != w:
                sq = jnp.pad(sq, ((0, 0), (0, 0), (0, wpad - w)))
            out["lapsq"] = S._split_sum(
                jnp.sum(sq.reshape(b, h, -1, S.LAPSQ_SEG), axis=3,
                        dtype=jnp.int32), 16)

        if "entropy" in stages:
            from facet_tpu.ops.pallas_entropy import hs_entropy_pallas_ilp

            hp_ = (S._pad_to_tiles(hh.reshape(b, -1), S.HS_CHUNK)
                   if n % S.HS_CHUNK else hh.reshape(b, -1))
            sp_ = (S._pad_to_tiles(ss.reshape(b, -1), S.HS_CHUNK)
                   if n % S.HS_CHUNK else ss.reshape(b, -1))
            if hp_.shape[1] != n:
                pad_mask = jnp.arange(hp_.shape[1]) >= n
                hp_ = jnp.where(pad_mask[None, :], -1, hp_)
            out["entropy"] = hs_entropy_pallas_ilp(hp_, sp_)

        if "phash" in stages:
            gf = gray.astype(jnp.float32)
            small = jnp.einsum("rh,bhw,cw->brc", hash_rows, gf, hash_cols)
            freq = dct @ small @ dct.T
            low = freq[:, :HASH_SIZE, :HASH_SIZE].reshape(
                -1, HASH_SIZE * HASH_SIZE)
            med = jnp.median(low, axis=1, keepdims=True)
            out["hash_bits"] = low > med

        if "vit" in stages:
            fbatch = batch_u8.astype(jnp.float32)
            crops = jnp.einsum("rh,bhwc->brwc", rows, fbatch)
            crops = jnp.einsum("sw,brwc->brsc", cols, crops)
            x = (crops / 255.0 - CLIP_MEAN) / CLIP_STD
            features = vision.apply(vp, x)
            raw = head.apply(hp, features)[:, 0]
            out["aesthetic"] = jnp.clip((raw + 1.0) * 5.0, 0.0, 10.0)
            out["embedding"] = features / jnp.linalg.norm(
                features, axis=-1, keepdims=True)
        return out

    return jax.jit(pipeline)


ALL = {"hist", "stencils", "sat", "entropy", "phash", "vit"}
VARIANTS = {
    "full": ALL,
    "no_entropy": ALL - {"entropy"},
    "no_hist": ALL - {"hist"},
    "no_stencils": ALL - {"stencils"},
    "no_hsv": ALL - {"sat", "entropy"},
    "no_phash": ALL - {"phash"},
    "vit_only": {"vit"},
    "stats_only": ALL - {"vit"},
}


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

    results = {}
    for name, stages in VARIANTS.items():
        fn = build_variant(vision, head, H, W, stages)
        t0 = time.time()
        jax.device_get(fn(vp, hp, buf))
        compile_s = time.time() - t0
        best = 0.0
        for _ in range(2):
            iters, t0 = 4, time.time()
            for _ in range(iters):
                jax.device_get(fn(vp, hp, buf))
            best = max(best, iters * B / (time.time() - t0))
        results[name] = best
        say(f"{name:12s} {best:7.1f} img/s  {1000.0 / best:5.2f} ms/img"
            f"  compile {compile_s:5.1f}s")

    full = results.get("full")
    if full:
        say("--- stage attribution (delta vs full, ms/img)")
        for name, rate in results.items():
            if name == "full":
                continue
            say(f"{name:12s} saves {1000.0 / full - 1000.0 / rate:+6.3f}")


if __name__ == "__main__":
    main()
