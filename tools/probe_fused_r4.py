#!/usr/bin/env python3
"""Round-4 fused-program probes: entropy implementation inside the hot path.

Round-4 standalone traces: the XLA radix entropy costs 1.58 ms/img of
device time; the packed ILP pallas kernel 0.45 ms/img (~164 TFLOP/s). This
harness measures the candidates IN the fused scoring program, which is
where the round-1 finding "a pallas_call inside the large fused program
wrecks XLA's scheduling" must be re-tested:

  xla          shipped fused program (baseline)
  zero         entropy stage elided — the program's floor
  split        fused program emits the (hue, sat) streams; the pallas ILP
               kernel runs as a SECOND program, dispatched back-to-back
  sub4_split   split with a stride-4 pixel subsample (fast-mode candidate)
  pallas       ILP kernel EMBEDDED in the fused program (compile risk: runs
               last so a pathological compile cannot eat the other results)

Timing is the engine's steady-state shape: issue every program for a step
back-to-back, fetch once (dispatch overlaps device compute). Optional
--trace captures a jax.profiler device trace for one variant.

Usage: python tools/probe_fused_r4.py [--batch 64] [--variants all]
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--h", type=int, default=1024)
    parser.add_argument("--w", type=int, default=1536)
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--repeats", type=int, default=2)
    parser.add_argument("--variants", default="all")
    parser.add_argument("--trace", default=None,
                        help="variant to wrap in jax.profiler.trace")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from facet_tpu.models.aesthetic import AestheticHead
    from facet_tpu.models.checkpoints import fallback_init, sds
    from facet_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
    from facet_tpu.ops.pallas_entropy import hs_entropy_pallas_ilp
    from facet_tpu.processing.device_pipeline import build_fused_pipeline

    config = CLIPVisionConfig()
    vision = CLIPVisionTower(config, dtype=jnp.bfloat16)
    head = AestheticHead()
    vp = fallback_init(
        vision, sds((1, config.image_size, config.image_size, 3)), seed=0)
    hp = fallback_init(head, sds((1, config.projection_dim)), seed=1)

    b, h, w = args.batch, args.h, args.w

    @jax.jit
    def synth(seed):
        n = b * h * w * 3
        x = (jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
             + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        return (x >> 13).astype(jnp.uint8).reshape((b, h, w, 3))

    buffers = [synth(i) for i in range(2)]
    for buf in buffers:
        jax.device_get(jnp.sum(buf.astype(jnp.int32)))
    print(f"batch={b} image={h}x{w} device={jax.devices()[0]}", flush=True)

    ent = jax.jit(lambda hs: hs_entropy_pallas_ilp(hs[0], hs[1]))

    def make_runner(entropy_impl, hs_subsample=1, second=False):
        fused = build_fused_pipeline(vision, head, h, w,
                                     hs_subsample=hs_subsample,
                                     entropy_impl=entropy_impl)
        if not second:
            return lambda buf: fused(vp, hp, buf)

        def run(buf):
            out = dict(fused(vp, hp, buf))
            # the (hue, sat) streams stay on device; only the reduced
            # entropy scalar joins the fetched results
            out["hs_entropy"] = ent(out.pop("hs_entropy"))
            return out

        return run

    variants = {
        "xla": lambda: make_runner("xla"),
        "zero": lambda: make_runner("zero"),
        "split": lambda: make_runner("none", second=True),
        "sub4_split": lambda: make_runner("none", hs_subsample=4,
                                          second=True),
        "pallas": lambda: make_runner("pallas"),
    }
    want = (list(variants) if args.variants == "all"
            else args.variants.split(","))

    for name in want:
        fn = variants[name]()
        print(f"[{name}] compiling...", flush=True)
        t0 = time.perf_counter()
        jax.device_get(fn(buffers[0]))
        compile_s = time.perf_counter() - t0
        best = 0.0
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for i in range(args.steps):
                jax.device_get(fn(buffers[i % 2]))
            best = max(best, args.steps * b / (time.perf_counter() - t0))
        print(f"  {name:12s} {best:7.1f} img/s  {1000 / best:6.2f} ms/img  "
              f"(compile {compile_s:.1f}s)", flush=True)
        if args.trace == name:
            logdir = f"/tmp/fused_trace_{name}"
            with jax.profiler.trace(logdir):
                for i in range(3):
                    jax.device_get(fn(buffers[i % 2]))
            print(f"  trace dir: {logdir}", flush=True)


if __name__ == "__main__":
    main()
