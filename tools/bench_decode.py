#!/usr/bin/env python3
"""Measure host JPEG ingest throughput: native decoder vs PIL, thread scaling.

At the 2,000 img/s full-ensemble target, 1.5 MP JPEG ingest is ~6 GB/s of
compressed input — host decode must scale across cores. This prints per-
thread-count decode rates (img/s and MB/s) for the native libjpeg-turbo
batch decoder (native/facet_io.cpp) and the single-thread PIL baseline, plus
the per-core extrapolation a production host needs.

Usage: python tools/bench_decode.py [--images N] [--size HxW] [--threads 1,2,4]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus(n, h, w, directory):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths, total_bytes = [], 0
    # photographic-ish content (smooth gradients + noise) so JPEG sizes are
    # realistic rather than noise-floor
    yy, xx = np.mgrid[0:h, 0:w]
    base = (np.sin(xx / 97.0) * 80 + np.cos(yy / 61.0) * 80 + 128)
    for i in range(n):
        noise = rng.normal(0, 18, (h, w, 3))
        arr = np.clip(base[..., None] + noise + i, 0, 255).astype(np.uint8)
        path = os.path.join(directory, f"img{i:04d}.jpg")
        Image.fromarray(arr).save(path, "JPEG", quality=88)
        paths.append(path)
        total_bytes += os.path.getsize(path)
    return paths, total_bytes


def bench_native(paths, total_bytes, threads):
    from facet_tpu.utils import native_decode

    if not native_decode.available():
        print("native decoder not built (make -C native)")
        return None
    rows = []
    for t in threads:
        t0 = time.perf_counter()
        out = native_decode.decode_jpeg_batch(paths, n_threads=t)
        dt = time.perf_counter() - t0
        n_ok = sum(1 for o in out if o is not None)
        rows.append((t, n_ok / dt, total_bytes / dt / 1e6))
        print(f"native threads={t}: {n_ok / dt:7.1f} img/s"
              f"  {total_bytes / dt / 1e6:7.1f} MB/s")
    return rows


def bench_pil(paths, total_bytes):
    from PIL import Image

    t0 = time.perf_counter()
    for p in paths:
        with Image.open(p) as img:
            np.asarray(img.convert("RGB"))
    dt = time.perf_counter() - t0
    rate = len(paths) / dt
    print(f"PIL single-thread: {rate:7.1f} img/s"
          f"  {total_bytes / dt / 1e6:7.1f} MB/s")
    return rate


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=64)
    parser.add_argument("--size", default="1024x1536")
    parser.add_argument("--threads", default=None,
                        help="comma list; default 1..cpu_count")
    args = parser.parse_args()
    h, w = (int(x) for x in args.size.split("x"))
    cores = os.cpu_count() or 1
    threads = ([int(x) for x in args.threads.split(",")] if args.threads
               else sorted({1, 2, 4, cores} & set(range(1, cores + 1))
                           | {1, cores}))

    with tempfile.TemporaryDirectory() as tmp:
        print(f"building {args.images} JPEGs at {h}x{w}...")
        paths, total_bytes = make_corpus(args.images, h, w, tmp)
        print(f"corpus: {total_bytes / 1e6:.1f} MB"
              f" ({total_bytes / args.images / 1e3:.0f} KB/img),"
              f" host cores: {cores}")
        pil_rate = bench_pil(paths, total_bytes)
        rows = bench_native(paths, total_bytes, threads)

    if rows:
        best_t, best_rate, best_mbps = max(rows, key=lambda r: r[1])
        per_core = best_rate / min(best_t, cores)
        print(f"\nbest: {best_rate:.1f} img/s at {best_t} thread(s)"
              f" ({best_rate / pil_rate:.2f}x PIL)")
        print(f"per-core decode rate: {per_core:.1f} img/s/core -> a"
              f" {2000 / per_core:.0f}-core host (or pre-decoded cache)"
              f" sustains the 2,000 img/s device target")


if __name__ == "__main__":
    main()
