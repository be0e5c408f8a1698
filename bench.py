#!/usr/bin/env python3
"""Benchmark: FULL-ensemble scoring throughput on one TPU chip.

Measures every ensemble member the default 16gb-profile scan runs, with
resident device inputs, steady-state after compilation:

- clip_fused: the fused program — classical metric statistics (histogram
  reductions + stencils), pHash, CLIP ViT-L/14 bf16 aesthetic forward;
- topiq: 384px bucketed resize + TOPIQ (CFANet/ResNet50) forward;
- samp: 224px resize + U2-Net-P saliency + SAMP-Net composition;
- faces: 640px device letterbox + SCRFD detect + device top-k decode.

The headline `full_ensemble` number times ONE loop that runs all four
members per batch (sequential device calls, as the engine does); per-member
throughput is also reported, plus the CLIP-only figure for continuity with
round 1.

WALL-CLOCK DISCIPLINE (rounds 4-5): the bench bounds its own runtime and
is outage-proof in four ways:

1. Backend availability is probed in SUBPROCESSES with a hard per-attempt
   timeout. The observed axon failure mode is `jax.devices()` BLOCKING
   inside backend init for 25+ minutes — an in-process retry loop cannot
   escape that (signals don't fire while init holds the GIL), but killing
   a probe child stuck pre-compile was observed NOT to wedge the service.
   The parent only initializes jax after a child probe has answered, so
   the parent's own init is near-certain to be fast.
2. The measurement budget counts from BACKEND-READY, not process start,
   so outage wait never eats measurement time.
3. A provisional headline JSON is printed after EVERY member finishes
   (compile+measure are interleaved per member), with `"provisional":
   true` and the serial-ensemble estimate 1/sum(1/rate_i) over members
   measured so far. The exact combined-loop number replaces it at the
   end. A SIGTERM/timeout at ANY point after the first member leaves a
   parseable headline on record; the driver reading the last JSON line
   gets the best-known number.
4. A PERSISTENT XLA COMPILATION CACHE (round 5, .cache/xla under the
   repo, verified to serialize/deserialize through the axon PJRT plugin)
   makes every compile after the first run of the round ~free, so an
   outage-squeezed driver window spends its seconds measuring, not
   compiling. The optional sections run in VALUE order — fast tier
   first (the number that decides the 2,000 img/s north star), then p50
   latency (a named BASELINE.md metric), ingest last — each emitting
   incrementally so a timeout keeps everything measured so far.

Batch is 256: the round-4 "+4.2% at b384" was re-measured in round 5 at
matched single-buffer methodology and refuted (339.5 vs 337.6 img/s on
the fused member — the delta was buffer-count methodology, not batch),
and SCRFD detection OOMs 16 GB HBM at b384 (docs/PERF.md "Batch 384,
re-measured and refuted").

vs_baseline is relative to the only throughput number the reference ships:
its auto-tuner's assumed 6.5 img/s batched-GPU constant
(config/percentile_normalizer.py:2224). It is NOT progress against the
2,000 img/s v5e-8 target — compare value*8 against that.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time


def _phase(msg):
    print(f"[{time.monotonic() - _START:7.1f}s] {msg}", file=sys.stderr,
          flush=True)

import numpy as np

BASELINE_IMG_PER_SEC = 6.5


_START = time.monotonic()
_RESULT = {}          # best-known result; printed by the signal handler


def _emit():
    print(json.dumps(_RESULT), flush=True)


def _on_term(signum, frame):
    if _RESULT.get("value"):
        _emit()
        os._exit(0)
    # nothing measured yet: exit nonzero so the driver does not misread
    # a headline-less run as success
    os._exit(1)


def wait_for_backend(retry_budget):
    """Probe `jax.devices()` in fresh subprocesses until one answers.

    Each attempt gets a hard timeout: the observed axon failure mode is
    backend init BLOCKING for 25+ min (not raising), which an in-process
    loop cannot escape. Killing a child stuck pre-compile does not wedge
    the service (round-3 observation). Returns True once a probe
    succeeds, False when retry_budget is exhausted.
    """
    probe = [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"]
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(probe, timeout=150, capture_output=True)
            if r.returncode == 0:
                _phase(f"backend probe {attempt} ok")
                return True
            tail = (r.stderr or b"").decode(errors="replace").strip()
            tail = tail.rsplit("\n", 1)[-1][:200]
            _phase(f"backend probe {attempt} rc={r.returncode}: {tail}")
        except subprocess.TimeoutExpired:
            _phase(f"backend probe {attempt} hung >150s; killed")
        waited = time.monotonic() - t0
        if waited + 20 > retry_budget:
            return False
        time.sleep(20)


def build_members(args):
    """-> {name: jitted fn(resident_uint8_batch) -> small host results}."""
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.aesthetic import AestheticHead
    from facet_tpu.models.checkpoints import fallback_init, sds
    from facet_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
    from facet_tpu.models.scrfd import SCRFD, SCRFD_10G, decode_topk
    from facet_tpu.models.samp_net import IMAGENET_MEAN, IMAGENET_STD, SAMPNet
    from facet_tpu.models.topiq import TOPIQConfig, TOPIQNet
    from facet_tpu.models.u2netp import U2NETP
    from facet_tpu.ops.resize import apply_separable_resize, resample_matrix
    from facet_tpu.processing.device_pipeline import build_fused_pipeline

    h, w = args.height, args.width
    members = {}

    # --- clip_fused: stats + pHash + ViT-L/14 + aesthetic head
    # fallback_init, NOT eager .init: eager init is ~1500 sequential RPC
    # dispatches on this relayed chip — it cost the round-2 bench 570 s of
    # wall-clock and the driver timed it out (BENCH_r02 rc=124)
    config = CLIPVisionConfig()
    vision = CLIPVisionTower(config, dtype=jnp.bfloat16)
    head = AestheticHead()
    vp = fallback_init(
        vision, sds((1, config.image_size, config.image_size, 3)), seed=0)
    hp = fallback_init(head, sds((1, config.projection_dim)), seed=1)
    fused = build_fused_pipeline(vision, head, h, w)
    # stashed for the optional fast-mode section (one extra fused build)
    build_members.vision, build_members.head = vision, head
    build_members.vp, build_members.hp = vp, hp
    # members return UN-FETCHED device outputs: the full-ensemble loop issues
    # every program back-to-back and fetches once per step, so dispatch/RPC
    # overhead overlaps device compute (device_get serializes otherwise)
    members["clip_fused"] = lambda buf: fused(vp, hp, buf)

    if args.members != "clip":
        # --- topiq: bucketed 384px eval, like TOPIQScorer.score_batch
        # (params are resolution-agnostic: one tree serves the fast tier too)
        tcfg = TOPIQConfig()
        tnet = TOPIQNet(tcfg)
        tparams = fallback_init(
            tnet, sds((1, tcfg.input_size, tcfg.input_size, 3)), seed=30)
        from facet_tpu.models.topiq import IMAGENET_MEAN as TM, IMAGENET_STD as TS

        def make_topiq_member(input_size):
            t_rows = jnp.asarray(resample_matrix(h, input_size, method="linear"))
            t_cols = jnp.asarray(resample_matrix(w, input_size, method="linear"))

            @jax.jit
            def topiq_fwd(params, buf):
                x = apply_separable_resize(buf, t_rows, t_cols) / 255.0
                return tnet.apply(params, (x - TM) / TS)

            # cross-attention activations cap the per-call batch (TOPIQConfig)
            t_cap = min(args.batch, tcfg.max_device_batch)

            def run_topiq(buf):
                return [topiq_fwd(tparams, buf[i:i + t_cap])
                        for i in range(0, buf.shape[0], t_cap)]

            return run_topiq

        build_members.make_topiq_member = make_topiq_member
        members["topiq"] = make_topiq_member(tcfg.input_size)

        # --- samp: 224px resize + U2NetP saliency + SAMPNet heads
        samp = SAMPNet()
        u2 = U2NETP()
        sp = fallback_init(samp, sds((1, 224, 224, 3)),
                           sds((1, 224, 224, 1)), seed=20)
        up = fallback_init(u2, sds((1, 224, 224, 3)), seed=21)
        s_rows = jnp.asarray(resample_matrix(h, 224, method="linear"))
        s_cols = jnp.asarray(resample_matrix(w, 224, method="linear"))

        @jax.jit
        def samp_fwd(samp_params, u2_params, buf):
            x = apply_separable_resize(buf, s_rows, s_cols) / 255.0
            norm = (x - IMAGENET_MEAN) / IMAGENET_STD
            saliency = u2.apply(u2_params, norm)
            return samp.apply(samp_params, norm, saliency)

        members["samp"] = lambda buf: samp_fwd(sp, up, buf)

        # --- faces: device letterbox + exact SCRFD det_10g + top-k decode
        # (fully convolutional: one param tree serves the fast tier's 448px)
        dcfg = SCRFD_10G
        det = SCRFD(dcfg)
        dp = fallback_init(
            det, sds((1, dcfg.input_size, dcfg.input_size, 3)), seed=10)

        def make_faces_member(size):
            scale = size / max(h, w)
            nh, nw = round(h * scale), round(w * scale)
            f_rows = jnp.asarray(resample_matrix(h, nh, method="linear"))
            f_cols = jnp.asarray(resample_matrix(w, nw, method="linear"))

            @jax.jit
            def face_fwd(params, buf):
                x = apply_separable_resize(buf, f_rows, f_cols)
                canvas = jnp.pad(x, ((0, 0), (0, size - nh), (0, size - nw),
                                     (0, 0)))
                canvas = (canvas - 127.5) / 128.0
                return decode_topk(det.apply(params, canvas))

            return lambda buf: face_fwd(dp, buf)

        build_members.make_faces_member = make_faces_member
        members["faces"] = make_faces_member(dcfg.input_size)

    return members


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--batch", type=int,
        default=int(os.environ.get("FACET_BENCH_BATCH", "256")))
    parser.add_argument("--height", type=int, default=1024)
    parser.add_argument("--width", type=int, default=1536)
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--repeats", type=int, default=2)
    parser.add_argument("--members", default="all", choices=["all", "clip"],
                        help="'clip' benches only the fused CLIP program")
    parser.add_argument(
        "--budget", type=float,
        default=float(os.environ.get("FACET_BENCH_BUDGET_S", "330")),
        help="wall-clock budget in seconds; optional sections (b=1 latency, "
             "ingest) are skipped once the budget would be exceeded")
    args = parser.parse_args()

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # the axon TPU service goes UNAVAILABLE intermittently, sometimes for
    # 25+ minutes (BENCH_r03 was lost to one such outage). Probe from
    # subprocesses before touching jax in-process; size the retry window
    # to outlast the observed outage length.
    retry_budget = float(os.environ.get("FACET_BENCH_BACKEND_RETRY_S",
                                        "2700"))
    if not wait_for_backend(retry_budget):
        _phase(f"backend unavailable after {retry_budget:.0f}s of probes")
        return 1

    import jax
    import jax.numpy as jnp

    # persistent XLA compilation cache (round 5): executables verified to
    # serialize/deserialize through the axon PJRT plugin, so a warm run
    # of this bench leaves every program's executable on disk and driver
    # reruns spend ~0 s compiling. One shared helper configures it for
    # the bench and every probe; FACET_XLA_CACHE=off disables.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from facet_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    _phase("jax imported")
    jax.devices()
    _phase("backend ready")

    # the measurement budget counts from BACKEND-READY: outage wait must
    # not eat measurement time
    ready_t = time.monotonic()

    def remaining():
        return args.budget - (time.monotonic() - ready_t)

    members = build_members(args)
    _phase("members built")

    # resident synthetic inputs (2 rotating buffers, generated on device).
    # Integer-hash fill, not threefry: a jitted threefry program over a
    # ~1.2 G-element buffer is a known compile hazard on this chip
    @jax.jit
    def synth(seed):
        n = args.batch * args.height * args.width * 3
        x = (jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
             + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        return (x >> 13).astype(jnp.uint8).reshape(
            (args.batch, args.height, args.width, 3))

    # two rotating buffers at b256 (different data each step); ONE at b384 —
    # the second 1.81 GB buffer is exactly what pushed the b384 ensemble
    # over 16 GB HBM at runtime (measured round 5). Throughput is
    # input-independent (no data-dependent control flow on device), so the
    # single-buffer loop measures the same steady state.
    n_buffers = 1 if args.batch >= 384 else 2
    buffers = [synth(i) for i in range(n_buffers)]
    for buf in buffers:
        _ = jax.device_get(jnp.sum(buf.astype(jnp.int32)))  # force materialize
    _phase(f"buffers resident (x{n_buffers})")

    metric = ("full_ensemble_images_per_second_per_chip"
              if args.members == "all"
              else "clip_fused_images_per_second_per_chip")

    # --- compile + measure each member IN TURN, emitting an updated
    # provisional headline after every one: a timeout mid-run still
    # leaves the best-known serial-ensemble estimate 1/sum(1/rate_i)
    # on record. clip_fused (the engine's floor) runs first.
    compile_s = {}
    member_rates = {}
    for name, fn in members.items():
        t0 = time.perf_counter()
        jax.device_get(fn(buffers[0]))
        compile_s[name] = round(time.perf_counter() - t0, 1)
        _phase(f"compiled {name}")
        best = 0.0
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for i in range(args.steps):
                jax.device_get(fn(buffers[i % len(buffers)]))
            best = max(best, args.steps * args.batch
                       / (time.perf_counter() - t0))
        member_rates[name] = round(best, 2)
        _phase(f"measured {name}")
        est = 1.0 / sum(1.0 / r for r in member_rates.values())
        _RESULT.update({
            "metric": metric,
            "value": round(est, 2),
            "unit": "images/sec",
            "vs_baseline": round(est / BASELINE_IMG_PER_SEC, 2),
            "provisional": True,
            "members_measured": list(member_rates),
            "members": dict(member_rates),
            "clip_only_images_per_second": member_rates.get("clip_fused"),
            "image_shape": [args.height, args.width],
            "batch": args.batch,
            "compile_seconds": dict(compile_s),
            "device": str(jax.devices()[0]),
        })
        _emit()      # a parseable headline is on record from here on

    # --- headline: ALL members over each batch in one timed loop.
    # Programs are issued back-to-back (async dispatch) and results fetched
    # once per step, like the engine's steady state — dispatch overhead
    # overlaps device compute instead of serializing on device_get.
    best = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for i in range(args.steps):
            buf = buffers[i % len(buffers)]
            jax.device_get([fn(buf) for fn in members.values()])
        best = max(best, args.steps * args.batch / (time.perf_counter() - t0))

    _RESULT.update({
        "value": round(best, 2),
        "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 2),
        "provisional": False,
    })
    _RESULT.pop("members_measured", None)
    _phase("headline measured")
    _emit()          # the exact headline replaces the estimates
    enriched = False

    # --- OPTIONAL: the fast speed tier (processing.speed_tier: "fast") —
    # stride-4 H-S entropy + TOPIQ at 256px + SCRFD at 448px, the documented
    # divergences of docs/SCORING.md. Built INCREMENTALLY (fused -> topiq ->
    # faces), re-measuring the ensemble and emitting after each swap, so a
    # timeout still leaves the best-known fast-tier number on record. The
    # exact-mode headline above stays the official metric.
    if args.members == "all" and remaining() > 30:
        from facet_tpu.models.face_pipeline import FAST_TIER_DET_SIZE
        from facet_tpu.models.topiq import FAST_TIER_INPUT_SIZE
        from facet_tpu.processing.device_pipeline import build_fused_pipeline

        fused_fast = build_fused_pipeline(
            build_members.vision, build_members.head, args.height,
            args.width, hs_subsample=4)
        fast_swaps = [
            ("clip_fused", "hs_subsample=4",
             lambda: lambda buf: fused_fast(
                 build_members.vp, build_members.hp, buf)),
            ("topiq", f"eval {FAST_TIER_INPUT_SIZE}px",
             lambda: build_members.make_topiq_member(FAST_TIER_INPUT_SIZE)),
            ("faces", f"det {FAST_TIER_DET_SIZE}px",
             lambda: build_members.make_faces_member(FAST_TIER_DET_SIZE)),
        ]
        fast_members = dict(members)
        fast_compile = {}
        fast_detail = {}
        for name, detail, make in fast_swaps:
            if remaining() < 20 and fast_detail:
                break   # keep what's measured rather than risk the budget
            fast_members[name] = make()
            t0 = time.perf_counter()
            jax.device_get(fast_members[name](buffers[0]))
            fast_compile[name] = round(time.perf_counter() - t0, 1)
            fast_detail[name] = detail
            best_fast = 0.0
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                for i in range(args.steps):
                    buf = buffers[i % len(buffers)]
                    jax.device_get([fn(buf) for fn in fast_members.values()])
                best_fast = max(
                    best_fast,
                    args.steps * args.batch / (time.perf_counter() - t0))
            _RESULT["fast_mode"] = {
                "images_per_second": round(best_fast, 2),
                "tier_members": dict(fast_detail),
                "complete": len(fast_detail) == len(fast_swaps),
                "compile_seconds": dict(fast_compile),
                "gate": "processing.speed_tier",
            }
            _phase(f"fast tier measured through {name}")
            _emit()

    # --- OPTIONAL: p50 single-image whole-ensemble latency (resident
    # input) — a named BASELINE.md metric, so it runs BEFORE the ingest
    # extra. The b=1 executables are the priciest optional compiles; the
    # low gate applies only once a prior run has them in the persistent
    # cache (sentinel), else the section demands the cold headroom so a
    # mid-compile overrun can't starve the compile-free ingest after it.
    p50_sentinel = os.path.join(cache_dir, "p50_b1_warmed") if cache_dir \
        else "/nonexistent"
    if remaining() > (40 if os.path.exists(p50_sentinel) else 150):
        single = buffers[0][:1]
        jax.device_get([fn(single) for fn in members.values()])  # compile b=1
        if cache_dir:
            open(p50_sentinel, "w").close()
        lat = []
        for _ in range(10):
            t0 = time.perf_counter()
            jax.device_get([fn(single) for fn in members.values()])
            lat.append(time.perf_counter() - t0)
        _RESULT["p50_latency_ms"] = round(float(np.median(lat) * 1000), 2)
        _phase("p50 latency measured")
        _emit()

    # --- OPTIONAL: ingest-limited rate on this machine's host->device link.
    # Compile-free: copy a 64-image host batch over the link, zero-pad it to
    # the already-compiled batch shape ON DEVICE, and run the full ensemble.
    # (This harness relay moves ~15-25 MB/s; a real v5e VM uses local DMA.)
    if remaining() > 20:
        ingest_n = min(args.batch, 64)
        host_batch = np.asarray(jax.device_get(buffers[0][:ingest_n]))
        pad = jax.jit(lambda x: jnp.pad(
            x, ((0, args.batch - ingest_n), (0, 0), (0, 0), (0, 0))))
        jax.device_get([fn(pad(jax.device_put(host_batch)))
                        for fn in members.values()])  # warm the pad program
        t0 = time.perf_counter()
        dev = jax.device_put(host_batch)
        dev.block_until_ready()                       # the copy alone
        t_link = time.perf_counter() - t0
        t1 = time.perf_counter()
        buf = pad(dev)
        jax.device_get([fn(buf) for fn in members.values()])
        dt = t_link + (time.perf_counter() - t1)      # copy + compute
        _RESULT["ingest_limited_images_per_second"] = round(ingest_n / dt, 2)
        _RESULT["h2d_link_mb_per_second"] = round(
            host_batch.nbytes / t_link / 1e6, 1)
        enriched = True

    if enriched:
        _emit()      # final line: same headline, plus the optional fields
    return 0


if __name__ == "__main__":
    sys.exit(main())
