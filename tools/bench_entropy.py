#!/usr/bin/env python3
"""Measure H-S joint-entropy formulations on the real TPU.

The H-S joint histogram (180x256 bins over ~1.5M pixels/image,
cv2-parity spec: reference analyzers/technical.py:79-113) is ~45% of the
fused statistics stage. This harness times candidate formulations so the
default in ops/stats.py is a measured decision (results: docs/PERF.md).

Variants:
  default       lax.map per image, scan over 128K-pixel chunks,
                bf16 one-hot compare, per-image (180,256) matmul
  batched       one scan over chunks; dot_general batched over images
  batched_int8  batched, int8 one-hots, int32 MXU accumulation
  batched_arith batched, arithmetic one-hot (relu(1-|x-iota|)) in bf16
  ceiling       pre-materialized random one-hots -> pure MXU time

Usage: python tools/bench_entropy.py [--batch 16] [--h 1024] [--w 1536]
"""

import argparse
import time

import numpy as np


def timeit(fn, args_, steps=3):
    import jax

    jax.device_get(fn(*args_))  # compile
    t0 = time.perf_counter()
    jax.device_get(fn(*args_))
    compile_plus = time.perf_counter() - t0
    best = float("inf")
    for _ in range(steps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args_))
        best = min(best, time.perf_counter() - t0)
    return best, compile_plus


def entropy_from_hist(hist2d):
    import jax.numpy as jnp

    prob = hist2d / jnp.sum(hist2d, axis=(-2, -1), keepdims=True)
    return -jnp.sum(
        jnp.where(prob > 0, prob * jnp.log2(jnp.where(prob > 0, prob, 1.0)),
                  0.0), axis=(-2, -1))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--h", type=int, default=1024)
    parser.add_argument("--w", type=int, default=1536)
    parser.add_argument("--chunk", type=int, default=32768)
    parser.add_argument("--variants", default="all")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    b, n = args.batch, args.h * args.w
    rng = np.random.default_rng(0)
    hh_host = rng.integers(0, 180, (b, n), np.int32)
    ss_host = rng.integers(0, 256, (b, n), np.int32)
    hh = jax.device_put(jnp.asarray(hh_host))
    ss = jax.device_put(jnp.asarray(ss_host))

    # numpy oracle for correctness
    oracle = np.empty(b, np.float64)
    for i in range(b):
        counts = np.bincount(hh_host[i] * 256 + ss_host[i], minlength=180 * 256)
        p = counts[counts > 0] / n
        oracle[i] = -(p * np.log2(p)).sum()

    h_bins = jnp.arange(180, dtype=jnp.int32)
    s_bins = jnp.arange(256, dtype=jnp.int32)
    chunk = args.chunk
    assert n % chunk == 0, (n, chunk)
    nchunks = n // chunk

    results = {}
    want = (args.variants.split(",") if args.variants != "all" else
            ["default", "batched", "batched_int8", "batched_arith", "ceiling"])

    if "default" in want:
        DEF_CHUNK = 128 * 1024

        @jax.jit
        def v_default(hh, ss):
            def per_image(rows):
                h_row, s_row = rows

                def body(acc, ci):
                    start = ci * DEF_CHUNK
                    hc = jax.lax.dynamic_slice(h_row, (start,), (DEF_CHUNK,))
                    sc = jax.lax.dynamic_slice(s_row, (start,), (DEF_CHUNK,))
                    oh_h = (hc[:, None] == h_bins[None, :]).astype(jnp.bfloat16)
                    oh_s = (sc[:, None] == s_bins[None, :]).astype(jnp.bfloat16)
                    return acc + jax.lax.dot_general(
                        oh_h, oh_s, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32), None

                hist, _ = jax.lax.scan(body, jnp.zeros((180, 256), jnp.float32),
                                       jnp.arange(n // DEF_CHUNK))
                return entropy_from_hist(hist)

            return jax.lax.map(per_image, (hh, ss))

        results["default"] = timeit(v_default, (hh, ss))

    def batched(make_oh, acc_dtype):
        @jax.jit
        def fn(hh, ss):
            hr = hh.reshape(b, nchunks, chunk).transpose(1, 0, 2)
            sr = ss.reshape(b, nchunks, chunk).transpose(1, 0, 2)

            def body(acc, rows):
                hc, sc = rows
                oh_h = make_oh(hc, h_bins)
                oh_s = make_oh(sc, s_bins)
                out = jax.lax.dot_general(
                    oh_h, oh_s, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=acc_dtype)
                return acc + out, None

            hist, _ = jax.lax.scan(
                body, jnp.zeros((b, 180, 256), acc_dtype), (hr, sr))
            return entropy_from_hist(hist.astype(jnp.float32))

        return fn

    def oh_cmp_bf16(vals, bins):
        return (vals[:, :, None] == bins[None, None, :]).astype(jnp.bfloat16)

    def oh_cmp_int8(vals, bins):
        return (vals[:, :, None] == bins[None, None, :]).astype(jnp.int8)

    def oh_arith_bf16(vals, bins):
        d = vals[:, :, None] - bins[None, None, :]
        return jnp.maximum(0, 1 - jnp.abs(d)).astype(jnp.bfloat16)

    if "batched" in want:
        results["batched"] = timeit(batched(oh_cmp_bf16, jnp.float32), (hh, ss))
    if "batched_int8" in want:
        results["batched_int8"] = timeit(batched(oh_cmp_int8, jnp.int32),
                                         (hh, ss))
    if "batched_arith" in want:
        results["batched_arith"] = timeit(batched(oh_arith_bf16, jnp.float32),
                                          (hh, ss))

    # 8-bit source domain: values and iota both uint8 so the VPU can pack
    # compares 4-per-lane; one-hot stays 8-bit into an int8 MXU matmul
    hh8 = hh.astype(jnp.uint8)
    ss8 = ss.astype(jnp.uint8)
    h_bins8 = h_bins.astype(jnp.uint8)
    s_bins8 = s_bins.astype(jnp.uint8)

    def batched_u8(acc_dtype, oh_dtype):
        @jax.jit
        def fn(hh, ss):
            hr = hh.reshape(b, nchunks, chunk).transpose(1, 0, 2)
            sr = ss.reshape(b, nchunks, chunk).transpose(1, 0, 2)

            def body(acc, rows):
                hc, sc = rows
                oh_h = (hc[:, :, None] == h_bins8[None, None, :]).astype(oh_dtype)
                oh_s = (sc[:, :, None] == s_bins8[None, None, :]).astype(oh_dtype)
                out = jax.lax.dot_general(
                    oh_h, oh_s, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=acc_dtype)
                return acc + out, None

            hist, _ = jax.lax.scan(
                body, jnp.zeros((b, 180, 256), acc_dtype), (hr, sr))
            return entropy_from_hist(hist.astype(jnp.float32))

        return fn

    if "u8_int8" in want or args.variants == "all":
        results["u8_int8"] = timeit(batched_u8(jnp.int32, jnp.int8), (hh8, ss8))
    if "u8_bf16" in want or args.variants == "all":
        results["u8_bf16"] = timeit(batched_u8(jnp.float32, jnp.bfloat16),
                                    (hh8, ss8))

    if "construct_only" in want or args.variants == "all":
        # one-hot construction + cheap reduce, no matmul: isolates VPU cost
        @jax.jit
        def v_construct(hh, ss):
            hr = hh.reshape(b, nchunks, chunk).transpose(1, 0, 2)
            sr = ss.reshape(b, nchunks, chunk).transpose(1, 0, 2)

            def body(acc, rows):
                hc, sc = rows
                oh_h = (hc[:, :, None] == h_bins[None, None, :]).astype(jnp.bfloat16)
                oh_s = (sc[:, :, None] == s_bins[None, None, :]).astype(jnp.bfloat16)
                return (acc + jnp.sum(oh_h, axis=(1, 2))
                        + jnp.sum(oh_s, axis=(1, 2))), None

            tot, _ = jax.lax.scan(body, jnp.zeros((b,), jnp.bfloat16), (hr, sr))
            return tot

        results["construct_only"] = timeit(v_construct, (hh, ss))

    if "transposed" in want or args.variants == "all":
        # one-hots built bins-major: (B, 180, C) x (B, C, 256) native matmul
        @jax.jit
        def v_transposed(hh, ss):
            hr = hh.reshape(b, nchunks, chunk).transpose(1, 0, 2)
            sr = ss.reshape(b, nchunks, chunk).transpose(1, 0, 2)

            def body(acc, rows):
                hc, sc = rows
                oh_h = (h_bins[None, :, None] == hc[:, None, :]).astype(jnp.bfloat16)
                oh_s = (sc[:, :, None] == s_bins[None, None, :]).astype(jnp.bfloat16)
                out = jax.lax.dot_general(
                    oh_h, oh_s, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return acc + out, None

            hist, _ = jax.lax.scan(
                body, jnp.zeros((b, 180, 256), jnp.float32), (hr, sr))
            return entropy_from_hist(hist)

        results["transposed"] = timeit(v_transposed, (hh, ss))

    if "pallas" in want or args.variants == "all":
        from facet_tpu.ops.pallas_entropy import CHUNK, hs_entropy_pallas

        padded = ((n + CHUNK - 1) // CHUNK) * CHUNK
        hh_p = (jnp.pad(hh, ((0, 0), (0, padded - n)), constant_values=-1)
                if padded != n else hh)
        ss_p = (jnp.pad(ss, ((0, 0), (0, padded - n)))
                if padded != n else ss)
        results["pallas"] = timeit(jax.jit(hs_entropy_pallas), (hh_p, ss_p))
        out = np.asarray(jax.device_get(hs_entropy_pallas(hh_p, ss_p)))
        print(f"  pallas max |err| vs numpy oracle: "
              f"{np.abs(out - oracle).max():.2e}")

    if "ceiling" in want:
        # pure MXU: same shapes, one pre-materialized chunk reused
        oh_h_mat = jax.device_put(
            jnp.asarray(rng.random((b, chunk, 180), np.float32),
                        jnp.bfloat16))
        oh_s_mat = jax.device_put(
            jnp.asarray(rng.random((b, chunk, 256), np.float32),
                        jnp.bfloat16))

        @jax.jit
        def v_ceiling(oh_h, oh_s):
            def body(acc, _):
                return acc + jax.lax.dot_general(
                    oh_h, oh_s, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32), None

            hist, _ = jax.lax.scan(body, jnp.zeros((b, 180, 256), jnp.float32),
                                   None, length=nchunks)
            return jnp.sum(hist)

        results["ceiling"] = timeit(v_ceiling, (oh_h_mat, oh_s_mat))

    # correctness check on the fastest real variant available
    for name in ("batched", "batched_arith", "batched_int8", "default"):
        if name in results and name != "ceiling":
            fn = {"default": None}.get(name)
            break

    print(f"batch={b} image={args.h}x{args.w} chunk={chunk} "
          f"device={jax.devices()[0]}")
    for name, (best, warm) in results.items():
        rate = b / best
        print(f"  {name:14s} {best * 1000:8.1f} ms/batch  {rate:7.1f} img/s  "
              f"(2nd call {warm * 1000:.0f} ms)")

    # verify batched variant numerics vs numpy oracle
    if "batched" in want:
        out = np.asarray(jax.device_get(
            batched(oh_cmp_bf16, jnp.float32)(hh, ss)))
        err = np.abs(out - oracle).max()
        print(f"  batched max |err| vs numpy oracle: {err:.2e}")


if __name__ == "__main__":
    main()
