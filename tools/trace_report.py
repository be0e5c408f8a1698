#!/usr/bin/env python3
"""Summarize a jax.profiler trace directory: device-op time attribution.

Parses the chrome-trace JSON (trace.json.gz) that jax.profiler.trace
writes, sums durations per op on the device tracks, and prints the top
entries — the poor man's tensorboard for this no-egress environment.

Usage: python tools/trace_report.py /tmp/fused_trace_pallas [--top 30]
       python tools/trace_report.py <dir> --merge-prefix  # group op families
"""

import argparse
import glob
import gzip
import json
import os
import re


def load_events(logdir):
    traces = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    with gzip.open(sorted(traces)[-1], "rt") as f:
        return json.load(f).get("traceEvents", [])


def device_op_times(events):
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
    return by_op


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("logdir")
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--merge-prefix", action="store_true",
                        help="merge ops that differ only by trailing .N")
    args = parser.parse_args()

    by_op = device_op_times(load_events(args.logdir))
    if args.merge_prefix:
        merged = {}
        for op, dur in by_op.items():
            key = re.sub(r"[.\d]+$", "", op)
            merged[key] = merged.get(key, 0.0) + dur
        by_op = merged
    total = sum(by_op.values())
    print(f"{total / 1000:.1f} ms device-op time total "
          f"({len(by_op)} entries); top {args.top}:")
    for op, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {dur / 1000:9.2f} ms  {dur / total * 100:5.1f}%  {op[:100]}")


if __name__ == "__main__":
    main()
