#!/usr/bin/env python3
"""Measure TOPIQ member throughput variants on the TPU chip.

Grid: query-chunk size x attention compute dtype x per-call sub-batch.
Params are built once with fallback_init (eval_shape + one compiled fill —
eager flax init is ~1500 sequential RPC dispatches on this relayed chip).
Output is appended unbuffered to the log path in argv[1] (default
/tmp/topiq_probe2.log) so progress is visible while compiles run.

Run alone: never concurrently with another TPU process (a killed compile
wedges the axon service for many minutes — docs/PERF.md).
"""

import sys
import time

import numpy as np

LOG = open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/topiq_probe2.log",
           "a", buffering=1)


def say(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


def main():
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.checkpoints import fallback_init, sds
    from facet_tpu.models.topiq import (IMAGENET_MEAN, IMAGENET_STD,
                                        TOPIQConfig, TOPIQNet)
    from facet_tpu.ops.resize import resample_matrix

    H, W, B = 1024, 1536, 256
    say(f"devices={jax.devices()}")

    tcfg = TOPIQConfig()
    size = tcfg.input_size
    rows = jnp.asarray(resample_matrix(H, size, method="linear"))
    cols = jnp.asarray(resample_matrix(W, size, method="linear"))

    # one shared param tree (shapes identical across variants)
    net0 = TOPIQNet(tcfg)
    t0 = time.time()
    params = fallback_init(net0, sds((1, size, size, 3)), seed=30)
    params = jax.device_put(params)
    say(f"params ready in {time.time() - t0:.1f}s")

    # resident uint8 source batch, tiled on device from one 4.7 MB frame
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (1, H, W, 3), dtype=np.uint8))
    buf = jax.jit(lambda f: jnp.tile(f, (B, 1, 1, 1)))(frame)
    buf.block_until_ready()
    say("source buffer resident")

    def build(attn_dtype, q_chunk):
        from dataclasses import replace

        fwd_net = TOPIQNet(replace(tcfg, q_chunk=q_chunk),
                           attn_dtype=attn_dtype)

        @jax.jit
        def fwd(p, sub):
            x = sub.astype(jnp.float32)
            x = jnp.einsum("rh,bhwc->brwc", rows, x)
            x = jnp.einsum("sw,brwc->brsc", cols, x) / 255.0
            return fwd_net.apply(p, (x - IMAGENET_MEAN) / IMAGENET_STD)

        return fwd

    import os

    grids = {
        # round 1: chunk-size x dtype x sub-batch (lax.map serializes chunks)
        "1": [
            ("f32_c1024_b16", jnp.float32, 1024, 16),
            ("f32_c1024_b64", jnp.float32, 1024, 64),
            ("bf16_c1024_b16", jnp.bfloat16, 1024, 16),
            ("bf16_c1024_b64", jnp.bfloat16, 1024, 64),
            ("f32_c256_b16", jnp.float32, 256, 16),
            ("bf16_c256_b64", jnp.bfloat16, 256, 64),
        ],
        # round 2: the unchunked full-score matrix (what shipped through
        # round 2 at f32) vs bf16 full and coarse 2-4 step maps
        "2": [
            ("f32_full_b16", jnp.float32, 16384, 16),
            ("bf16_full_b16", jnp.bfloat16, 16384, 16),
            ("bf16_c4608_b16", jnp.bfloat16, 4608, 16),
            ("f32_c4608_b16", jnp.float32, 4608, 16),
            ("bf16_full_b32", jnp.bfloat16, 16384, 32),
        ],
    }
    results = []
    for name, attn_dtype, q_chunk, cap in grids[os.environ.get("GRID", "1")]:
        try:
            fwd = build(attn_dtype, q_chunk)
            t0 = time.time()
            outs = [fwd(params, buf[i:i + cap]) for i in range(0, B, cap)]
            jax.block_until_ready(outs)
            compile_s = time.time() - t0
            say(f"{name}: compiled+first in {compile_s:.1f}s")
            iters, t0 = 3, time.time()
            for _ in range(iters):
                outs = [fwd(params, buf[i:i + cap]) for i in range(0, B, cap)]
                jax.block_until_ready(outs)
            dt = (time.time() - t0) / iters
            ips = B / dt
            say(f"{name}: {ips:.1f} img/s ({1e3 * dt / B:.2f} ms/img, "
                f"compile {compile_s:.1f}s)")
            results.append((name, ips))
        except Exception as e:
            say(f"{name}: FAILED {type(e).__name__}: {e}")

    say("RESULTS " + " | ".join(f"{n}={v:.1f}" for n, v in results))


if __name__ == "__main__":
    main()
