#!/usr/bin/env python3
"""Benchmark: full-ensemble scoring throughput on one TPU chip.

Measures the fused device pipeline — classical metric statistics (histogram
reductions + stencils), pHash, CLIP ViT-L/14 aesthetic forward — over
synthetic 1.5 MP images, steady-state after compilation. This is the engine's
device hot path; host JPEG decode runs concurrently in production and is
benchmarked separately.

Prints ONE JSON line. vs_baseline is relative to the only throughput number
the reference ships: its auto-tuner's assumed 6.5 img/s batched-GPU constant
(config/percentile_normalizer.py:2224).
"""

import argparse
import json
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 6.5


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=96)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--height", type=int, default=1024)
    parser.add_argument("--width", type=int, default=1536)
    parser.add_argument("--repeats", type=int, default=2)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from facet_tpu.models.aesthetic import AestheticHead
    from facet_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
    from facet_tpu.processing.device_pipeline import build_fused_pipeline

    config = CLIPVisionConfig()  # full ViT-L/14
    vision = CLIPVisionTower(config, dtype=jnp.bfloat16)
    head = AestheticHead()
    vision_params = vision.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, config.image_size, config.image_size, 3), jnp.float32))
    head_params = head.init(
        jax.random.PRNGKey(1), jnp.zeros((1, config.projection_dim), jnp.float32))

    pipeline = build_fused_pipeline(vision, head, args.height, args.width)

    rng = np.random.default_rng(0)
    n_batches = max(1, args.images // args.batch)
    batches = [
        rng.integers(0, 256, (args.batch, args.height, args.width, 3), dtype=np.uint8)
        for _ in range(min(n_batches, 4))
    ]

    def run_batch(host_batch):
        out = pipeline(vision_params, head_params, jnp.asarray(host_batch))
        jax.block_until_ready(out["aesthetic"])
        return out

    # compile + warmup
    run_batch(batches[0])

    # steady state
    best = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        done = 0
        for i in range(n_batches):
            run_batch(batches[i % len(batches)])
            done += args.batch
        rate = done / (time.perf_counter() - t0)
        best = max(best, rate)

    # p50 single-image latency
    single = batches[0][:1]
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        run_batch(single)
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat) * 1000)

    result = {
        "metric": "full_ensemble_images_per_second_per_chip",
        "value": round(best, 2),
        "unit": "images/sec",
        "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 2),
        "p50_latency_ms": round(p50_ms, 2),
        "image_shape": [args.height, args.width],
        "batch": args.batch,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
