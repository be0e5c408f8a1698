#!/usr/bin/env python3
"""Measure the fused member with the pallas row-softmax in the ViT.

Variants: xla (shipped), psoftmax (ops/pallas_softmax.py). Same harness
discipline as the other round-4 probes; one TPU process at a time.
"""

import sys
import time

import numpy as np

LOG = open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vit_softmax_probe.log",
           "a", buffering=1)


def say(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


def main():
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.aesthetic import AestheticHead
    from facet_tpu.models.checkpoints import fallback_init, sds
    from facet_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
    from facet_tpu.processing.device_pipeline import build_fused_pipeline

    B, H, W = (int(sys.argv[2]) if len(sys.argv) > 2 else 256), 1024, 1536
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

    results = []
    ref = None
    for impl in ("xla", "psoftmax"):
        try:
            fused = build_fused_pipeline(vision, head, H, W, attn_impl=impl)
            t0 = time.time()
            out = jax.device_get(fused(vp, hp, buf))
            compile_s = time.time() - t0
            scores = np.asarray(out["aesthetic"])
            if ref is None:
                ref = scores
            delta = float(np.max(np.abs(scores - ref)))
            iters, t0 = 3, time.time()
            for _ in range(iters):
                jax.device_get(fused(vp, hp, buf))
            dt = (time.time() - t0) / iters
            ips = B / dt
            say(f"{impl}: {ips:.1f} img/s ({1e3 * dt / B:.2f} ms/img, "
                f"compile {compile_s:.1f}s, max|dscore|={delta:.2e})")
            results.append((impl, ips))
        except Exception as e:
            say(f"{impl}: FAILED {type(e).__name__}: {e}")

    say("RESULTS " + " | ".join(f"{n}={v:.1f}" for n, v in results))


if __name__ == "__main__":
    main()
