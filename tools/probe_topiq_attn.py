#!/usr/bin/env python3
"""Measure the TOPIQ member with the pallas cross-attention kernel (round 4).

Grid: attention impl (xla ChunkedAttention vs pallas one-pass kernel)
x q_block x per-call sub-batch. Same harness discipline as probe_topiq.py:
params via fallback_init, resident uint8 source, unbuffered log, ONE TPU
process at a time.
"""

import os
import sys
import time

import numpy as np

LOG = open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/topiq_attn_probe.log",
           "a", buffering=1)


def say(msg):
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


def main():
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.checkpoints import fallback_init, sds
    from facet_tpu.models.topiq import (IMAGENET_MEAN, IMAGENET_STD,
                                        TOPIQConfig, TOPIQNet)
    from facet_tpu.ops import pallas_attn
    from facet_tpu.ops.resize import resample_matrix

    H, W, B = 1024, 1536, 256
    say(f"devices={jax.devices()}")

    tcfg = TOPIQConfig()
    size = tcfg.input_size
    rows = jnp.asarray(resample_matrix(H, size, method="linear"))
    cols = jnp.asarray(resample_matrix(W, size, method="linear"))

    net0 = TOPIQNet(tcfg)
    t0 = time.time()
    params = fallback_init(net0, sds((1, size, size, 3)), seed=30)
    params = jax.device_put(params)
    say(f"params ready in {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (1, H, W, 3), dtype=np.uint8))
    buf = jax.jit(lambda f: jnp.tile(f, (B, 1, 1, 1)))(frame)
    buf.block_until_ready()
    say("source buffer resident")

    def build():
        fwd_net = TOPIQNet(tcfg)

        @jax.jit
        def fwd(p, sub):
            x = sub.astype(jnp.float32)
            x = jnp.einsum("rh,bhwc->brwc", rows, x)
            x = jnp.einsum("sw,brwc->brsc", cols, x) / 255.0
            return fwd_net.apply(p, (x - IMAGENET_MEAN) / IMAGENET_STD)

        return fwd

    variants = [
        ("xla_b16", "xla", None, 16),
        ("pallas_qb512_b16", "pallas", 512, 16),
        ("pallas_qb256_b16", "pallas", 256, 16),
        ("pallas_qb1024_b16", "pallas", 1024, 16),
        ("pallas_qb512_b32", "pallas", 512, 32),
        ("pallas_qb512_b64", "pallas", 512, 64),
    ]
    results = []
    ref_scores = None
    for name, impl, qb, cap in variants:
        try:
            os.environ["FACET_TOPIQ_ATTN"] = impl
            if qb is not None:
                pallas_attn.DEFAULT_Q_BLOCK = qb
            fwd = build()
            t0 = time.time()
            outs = [fwd(params, buf[i:i + cap]) for i in range(0, B, cap)]
            jax.block_until_ready(outs)
            compile_s = time.time() - t0
            scores = np.concatenate([np.asarray(o) for o in outs])
            if ref_scores is None:
                ref_scores = scores
            delta = float(np.max(np.abs(scores - ref_scores)))
            iters, t0 = 3, time.time()
            for _ in range(iters):
                outs = [fwd(params, buf[i:i + cap]) for i in range(0, B, cap)]
                jax.block_until_ready(outs)
            dt = (time.time() - t0) / iters
            ips = B / dt
            say(f"{name}: {ips:.1f} img/s ({1e3 * dt / B:.2f} ms/img, "
                f"compile {compile_s:.1f}s, max|dscore|={delta:.2e})")
            results.append((name, ips))
        except Exception as e:
            say(f"{name}: FAILED {type(e).__name__}: {e}")

    say("RESULTS " + " | ".join(f"{n}={v:.1f}" for n, v in results))


if __name__ == "__main__":
    main()
