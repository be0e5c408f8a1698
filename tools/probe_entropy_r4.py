#!/usr/bin/env python3
"""Round-4 H-S entropy probes: MXU occupancy, fast mode, profiler trace.

The round-3 verdict: the shipped XLA formulation plateaus at ~3.3 ms/img
(1.5 MP) and the round-2 pallas kernel ran on ~1 MXU because its per-row
dots serialize through one accumulator. This harness measures the remaining
levers on the real chip:

  xla_shipped        the shipped radix-packed formulation (ops/stats.py
                     hs_entropy_radix) — baseline re-measure
  xla_sub4           the same on a stride-4 pixel subsample (fast-mode
                     candidate: same 180x256 histogram, 1/4 the pixels)
  pallas_base        round-2 kernel (single accumulator chain) — re-confirm
  pallas_ilp{2,4,8}  K-split independent dot chains (bf16, unpacked)
  pallas_ilp4p       splits=4 + radix-packed S side (half the MXU passes)
  pallas_ilp8p       splits=8 + packed
  pallas_ilp4_int8   splits=4, int8 one-hots (MXU double rate), unpacked

Every variant is numerics-checked against a numpy bincount oracle.

--profile wraps the chosen variant in jax.profiler.trace and prints the
top device ops from the captured trace.json.gz (attribution for the
"where do the 3.3 ms go" question; works only if the axon backend
supports device tracing — failure is reported, not fatal).

Usage: python tools/probe_entropy_r4.py [--batch 16] [--variants all]
       python tools/probe_entropy_r4.py --profile xla_shipped
"""

import argparse
import glob
import gzip
import json
import os
import time

import numpy as np


def timeit(fn, args_, steps=3):
    import jax

    t0 = time.perf_counter()
    jax.device_get(fn(*args_))  # compile
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(steps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args_))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--h", type=int, default=1024)
    parser.add_argument("--w", type=int, default=1536)
    parser.add_argument("--variants", default="all")
    parser.add_argument("--profile", default=None,
                        help="variant name to trace with jax.profiler")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from facet_tpu.ops.pallas_entropy import (hs_entropy_pallas,
                                              hs_entropy_pallas_ilp)
    from facet_tpu.ops.stats import HS_CHUNK, hs_entropy_radix

    b, n = args.batch, args.h * args.w
    rng = np.random.default_rng(0)
    hh_host = rng.integers(0, 180, (b, n), np.int32)
    ss_host = rng.integers(0, 256, (b, n), np.int32)
    hh = jax.device_put(jnp.asarray(hh_host))
    ss = jax.device_put(jnp.asarray(ss_host))
    # shipped-path padding (multiple of HS_CHUNK, hue -1 markers)
    n_pad = -(-n // HS_CHUNK) * HS_CHUNK
    hh_p = (jnp.pad(hh, ((0, 0), (0, n_pad - n)), constant_values=-1)
            if n_pad != n else hh)
    ss_p = (jnp.pad(ss, ((0, 0), (0, n_pad - n))) if n_pad != n else ss)

    oracle = np.empty(b, np.float64)
    for i in range(b):
        counts = np.bincount(hh_host[i] * 256 + ss_host[i],
                             minlength=180 * 256)
        p = counts[counts > 0] / n
        oracle[i] = -(p * np.log2(p)).sum()
    oracle_sub = np.empty(b, np.float64)
    for i in range(b):
        counts = np.bincount(hh_host[i, ::4] * 256 + ss_host[i, ::4],
                             minlength=180 * 256)
        tot = counts.sum()
        p = counts[counts > 0] / tot
        oracle_sub[i] = -(p * np.log2(p)).sum()

    variants = {
        "xla_shipped": (jax.jit(hs_entropy_radix), (hh_p, ss_p), oracle),
        "xla_sub4": (jax.jit(lambda h, s: hs_entropy_radix(
            h, s, pixel_subsample=4)), (hh_p, ss_p), None),
        "pallas_base": (jax.jit(hs_entropy_pallas), (hh, ss), oracle),
        "pallas_ilp2": (lambda h, s: hs_entropy_pallas_ilp(
            h, s, splits=2, packed=False), (hh, ss), oracle),
        "pallas_ilp4": (lambda h, s: hs_entropy_pallas_ilp(
            h, s, splits=4, packed=False), (hh, ss), oracle),
        "pallas_ilp8": (lambda h, s: hs_entropy_pallas_ilp(
            h, s, splits=8, packed=False), (hh, ss), oracle),
        "pallas_ilp4p": (lambda h, s: hs_entropy_pallas_ilp(
            h, s, splits=4, packed=True), (hh, ss), oracle),
        "pallas_ilp8p": (lambda h, s: hs_entropy_pallas_ilp(
            h, s, splits=8, packed=True), (hh, ss), oracle),
        "pallas_ilp4_int8": (lambda h, s: hs_entropy_pallas_ilp(
            h, s, splits=4, packed=False, use_int8=True), (hh, ss), oracle),
    }

    if args.profile:
        name = args.profile
        fn, fargs, _ = variants[name]
        logdir = f"/tmp/entropy_trace_{name}"
        jax.device_get(fn(*fargs))  # compile outside the trace
        try:
            with jax.profiler.trace(logdir):
                for _ in range(3):
                    jax.device_get(fn(*fargs))
        except Exception as e:  # axon may not support device tracing
            print(f"profiler FAILED: {type(e).__name__}: {e}")
            return
        traces = glob.glob(os.path.join(
            logdir, "**", "*.trace.json.gz"), recursive=True)
        if not traces:
            print(f"no trace.json.gz produced under {logdir}")
            return
        with gzip.open(sorted(traces)[-1], "rt") as f:
            events = json.load(f).get("traceEvents", [])
        # attribute device-track op durations by name
        pids = {e["pid"]: e["args"].get("name", "")
                for e in events if e.get("ph") == "M"
                and e.get("name") == "process_name" and "args" in e}
        by_op = {}
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            track = pids.get(e.get("pid"), "")
            if "TPU" not in track and "/device" not in track.lower():
                continue
            by_op[e["name"]] = by_op.get(e["name"], 0.0) + e["dur"]
        total = sum(by_op.values())
        print(f"device trace: {total / 1000:.1f} ms total over 3 steps "
              f"({len(by_op)} distinct ops); top 25:")
        for op, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {dur / 1000:9.2f} ms  {dur / total * 100:5.1f}%  {op[:90]}")
        print(f"trace dir kept: {logdir}")
        return

    want = (list(variants) if args.variants == "all"
            else args.variants.split(","))
    print(f"batch={b} image={args.h}x{args.w} device={jax.devices()[0]}")
    for name in want:
        fn, fargs, orc = variants[name]
        try:
            best, compile_s = timeit(fn, fargs)
        except Exception as e:
            print(f"  {name:18s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
            continue
        ms_img = best * 1000 / b
        line = (f"  {name:18s} {best * 1000:8.1f} ms/batch  "
                f"{ms_img:6.2f} ms/img  {b / best:7.1f} img/s  "
                f"(compile {compile_s:.1f}s)")
        if orc is not None:
            out = np.asarray(jax.device_get(fn(*fargs)))
            line += f"  max|err|={np.abs(out - orc).max():.2e}"
        elif name == "xla_sub4":
            out = np.asarray(jax.device_get(fn(*fargs)))
            line += f"  max|err vs sub-oracle|={np.abs(out - oracle_sub).max():.2e}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
