"""On-chip throughput of the ENGINE's orchestrated hot path (round 5).

bench.py times raw member programs on resident device buffers; this probe
times ChunkedMultiPassProcessor._process_loaded_chunk — the production
joint-dispatch path: one host->device transfer per chunk, fused program +
SCRFD + TOPIQ rider + SAMP rider dispatched back-to-back with one fetch,
host epilogues (exact metric math, aggregate brain, thumbnails), and the
single-transaction SQLite save. (VERDICT r4 item 3: "if orchestration eats
20% nobody would currently know".)

Decoded chunks are pre-staged as synthetic host arrays so this 1-core
host's JPEG decode doesn't bottleneck the measurement (a real v5e VM has
tens of cores for decode; decode rates are benched separately in
tools/bench_decode.py). The harness relay's host->device link (~15-25
MB/s vs local DMA on a real VM) is measured per-chunk via a separate
device_put of the same bytes and reported BOTH ways:

- engine_images_per_second:          everything incl. relay transfer
- engine_excl_h2d_images_per_second: transfer-corrected — the number
  comparable to bench.py's resident-buffer member loop

Usage: python tools/probe_engine.py [--images 1024x1536] [--chunk 64]
       [--chunks 3] [--skip-faces-secondary]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import facet_tpu  # noqa: E402,F401  (applies FACET_PLATFORM before jax init)


def synth_chunk(n, h, w, seed):
    """Deterministic structured noise (not flat: exercises hist/entropy)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (n, h // 8, w // 8, 3), dtype=np.uint8)
    up = np.kron(base, np.ones((1, 8, 8, 1), dtype=np.uint8))
    noise = rng.integers(0, 32, (n, h, w, 3), dtype=np.uint8)
    return np.clip(up.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", default="1024x1536")
    parser.add_argument("--chunk", type=int, default=64)
    parser.add_argument("--chunks", type=int, default=3)
    parser.add_argument("--warm-chunks", type=int, default=1)
    args = parser.parse_args()
    h, w = (int(x) for x in args.images.split("x"))

    workdir = tempfile.mkdtemp(prefix="facet_engine_probe_")
    os.chdir(workdir)

    import jax

    from facet_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    jax.devices()
    print("backend ready", file=sys.stderr, flush=True)

    from PIL import Image as PILImage

    from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor
    from facet_tpu.processing.scorer import Facet

    scorer = Facet(db_path=os.path.join(workdir, "probe.db"),
                   multi_pass=True)
    proc = ChunkedMultiPassProcessor(scorer)
    # pin the exact member set the bench headline measures (the 16gb
    # profile's vision members), one bin-packed pass group -> joint dispatch
    proc.selected_models = ["clip", "topiq", "samp_net", "insightface"]
    proc.passes = [["clip", "topiq", "samp_net", "insightface"]]
    print(f"passes pinned: {proc.passes}", file=sys.stderr, flush=True)
    # random-init SCRFD fires on structured noise (hundreds of phantom
    # boxes per image), dragging per-face secondary stages (crops +
    # landmark/embed programs at data-dependent batch shapes) into the
    # orchestration measurement — one probe chunk measured 263 s of
    # phantom-face epilogue. Pin the threshold so detection (the part
    # bench.py's faces member times) runs but decodes to zero faces;
    # per-face secondaries are covered by tests and scale with the REAL
    # face count on real weights (~1-2 faces/img in a photo library).
    face_model = scorer.models.load_model("insightface")
    face_model.score_threshold = 10.0

    exif = {"iso": 200, "f_stop": 2.8, "shutter_speed": "1/250",
            "focal_length": 50.0, "date_taken": "2026:08:20 12:00:00",
            "camera_model": "synthetic", "lens_model": "synthetic"}

    def run_chunk(seed):
        arrs = synth_chunk(args.chunk, h, w, seed)
        images = [arrs[i] for i in range(args.chunk)]
        pils = [PILImage.fromarray(a) for a in images]
        paths = [f"/synthetic/{seed}_{i}.jpg" for i in range(args.chunk)]
        t0 = time.perf_counter()
        n = proc._process_loaded_chunk(
            paths, images, [p for p in pils],
            {p: dict(exif) for p in paths})
        dt = time.perf_counter() - t0
        assert n == args.chunk, (n, args.chunk)
        return dt, np.stack(images)

    # warmup chunks compile every program (cached across runs)
    for k in range(args.warm_chunks):
        dt, _ = run_chunk(seed=1000 + k)
        print(f"warm chunk {k}: {dt:.1f}s", file=sys.stderr, flush=True)
    warm_phases = dict(proc.phase_times)   # measured deltas exclude compiles

    # measured chunks + a separate h2d timing of the same bytes to
    # estimate the relay-transfer share of each chunk
    totals, h2d = [], []
    for k in range(args.chunks):
        dt, stacked = run_chunk(seed=k)
        totals.append(dt)
        t0 = time.perf_counter()
        dev = jax.device_put(stacked)
        dev.block_until_ready()
        h2d.append(time.perf_counter() - t0)
        del dev
        print(f"chunk {k}: {dt:.1f}s total, {h2d[-1]:.1f}s h2d estimate",
              file=sys.stderr, flush=True)

    n_total = args.chunk * args.chunks
    t_total = sum(totals)
    t_h2d = sum(h2d)
    phases = {k: round(v - warm_phases.get(k, 0.0), 2)
              for k, v in proc.phase_times.items()}
    result = {
        "metric": "engine_images_per_second_per_chip",
        "value": round(n_total / t_total, 2),
        "engine_excl_h2d_images_per_second":
            round(n_total / max(t_total - t_h2d, 1e-9), 2),
        "h2d_seconds_per_chunk": round(t_h2d / args.chunks, 2),
        "chunk": args.chunk,
        "chunks": args.chunks,
        "image_shape": [h, w],
        "phase_times_measured_chunks": phases,
        "db_rows": args.chunk * (args.warm_chunks + args.chunks),
        "device": str(jax.devices()[0]),
    }
    import sqlite3

    con = sqlite3.connect(os.path.join(workdir, "probe.db"))
    rows = con.execute("SELECT COUNT(*), COUNT(aggregate) FROM photos").fetchone()
    result["db_rows_written"] = rows[0]
    assert rows[0] == rows[1] == result["db_rows"], (rows, result["db_rows"])
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
