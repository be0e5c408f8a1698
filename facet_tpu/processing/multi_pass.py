"""Chunked multi-pass processing: the default scan mode.

Design (reference: processing/multi_pass.py:47-1028, re-planned for TPU):
- detect per-device HBM -> select ensemble members for the profile -> bin-pack
  them into passes against the HBM budget (one pass fits everything on a
  16 GB v5e unless a 7B VLM is enabled);
- per chunk (auto-tuned 10-500 images): host does ALL CPU work once (decode +
  EXIF), device computes technical stats + pHash, then each pass group loads
  its models, runs batched forwards, and unloads (params pinned in host RAM);
- aggregates + category routing + one-transaction save per chunk;
- a RAM monitor daemon grows/shrinks the chunk size between chunks.

Phase timings (io / model_load / inference / unload / save) and the model
RAM-cache hit rate are reported at the end, same vocabulary as the reference.
"""

import os
import time

import numpy as np

from facet_tpu.processing.metrics_reporter import MetricsReporter
from facet_tpu.processing.resource_monitor import MultiPassResourceMonitor
from facet_tpu.utils.exif import get_exif_batch
from facet_tpu.utils.image_loading import load_image
from facet_tpu.ops.phash import phash_batch

PASS_NAMES = {
    "quality": ["clip", "topiq"],
    "tags": ["clip"],
    "composition": ["samp_net"],
    "faces": ["insightface"],
    "embeddings": ["clip"],
}

# unavailable-model fallback chains (reference: multi_pass.py:864-885 —
# vlm -> ram -> clip tagging; musiq/hyperiqa/dbcnn -> topiq -> clip aesthetic)
FALLBACK_CHAINS = {
    "vlm_tagger": ["qwen3_vl_tagger", "ram_tagger"],   # then implicit clip
    "qwen3_vl_tagger": ["ram_tagger"],
    "ram_tagger": [],
    "musiq": ["topiq", "clipiqa"],
    "hyperiqa": ["topiq", "clipiqa"],
    "dbcnn": ["topiq", "clipiqa"],
    "topiq": ["clipiqa"],
    "clipiqa": [],
}

QUALITY_PASS_MODELS = ("topiq", "hyperiqa", "dbcnn", "musiq", "clipiqa")

# Column ownership for --pass partial updates: a single pass only
# overwrites the columns of the models it actually ran plus the
# always-recomputed prepass columns; everything else on an EXISTING row is
# preserved, and the aggregate/category recompute afterwards from the
# MERGED row (scorer.update_all_aggregates(paths=...)). The reference's
# run_single_pass REPLACEs full rows with 5.0/0 defaults for the models it
# skipped (multi_pass.py:764-861) — a deliberate data-preserving
# divergence, documented in docs/MIGRATION.md.
PREPASS_COLUMNS = (
    "filename", "date_taken", "camera_model", "lens_model", "iso", "f_stop",
    "shutter_speed", "focal_length", "focal_length_35mm", "image_width",
    "image_height", "tech_sharpness", "color_score", "exposure_score",
    "raw_sharpness_variance", "histogram_data", "histogram_spread",
    "mean_luminance", "histogram_bimodality", "raw_color_entropy",
    "shadow_clipped", "highlight_clipped", "dynamic_range_stops",
    "noise_sigma", "contrast_score", "mean_saturation", "is_monochrome",
    "is_silhouette", "thumbnail", "phash",
)
MODEL_COLUMNS = {
    "clip": ("aesthetic", "clip_embedding", "tags", "scoring_model"),
    "samp_net": ("comp_score", "composition_pattern",
                 "composition_explanation", "power_point_score",
                 "leading_lines_score"),
    "insightface": ("face_count", "face_quality", "eye_sharpness",
                    "face_sharpness", "face_ratio", "is_blink",
                    "is_group_portrait", "face_confidence",
                    "raw_eye_sharpness", "isolation_bonus"),
}
for _q in QUALITY_PASS_MODELS:
    MODEL_COLUMNS[_q] = ("quality_score", "topiq_score", "aesthetic",
                         "scoring_model")
for _t in ("vlm_tagger", "qwen3_vl_tagger", "ram_tagger"):
    MODEL_COLUMNS[_t] = ("tags",)


class ChunkedMultiPassProcessor:
    def __init__(self, scorer, model_manager=None, config=None):
        self.scorer = scorer
        self.config = config or scorer.config
        self.models = model_manager or scorer.models
        processing = self.config.get_processing_settings()
        tuning = processing.get("auto_tuning", {})
        self.chunk_size = processing.get("ram_chunk_size", 100)
        self.monitor = MultiPassResourceMonitor(
            chunk_size=self.chunk_size,
            min_chunk=tuning.get("min_ram_chunk_size", 10),
            max_chunk=tuning.get("max_ram_chunk_size", 500),
            memory_limit_percent=tuning.get("memory_limit_percent", 85),
            model_manager=self.models,
        )
        self.phase_times = {"io": 0.0, "model_load": 0.0, "inference": 0.0,
                            "unload": 0.0, "aggregate": 0.0, "save": 0.0}
        self.selected_models = None
        self.passes = None
        self._resolved = {}       # requested model name -> loaded name/None
        self._update_only = None  # single-pass: columns allowed to overwrite
        self.load_errors = {}     # path -> decode failure reason

    # -------------------------------------------------------------- planning

    def detect_and_configure(self, verbose=True):
        hbm = self.models.hbm_gb
        self.selected_models = self.models.select_models(self.config)
        self.passes = self.models.group_passes(self.selected_models)
        if verbose:
            mode = f"{hbm:.1f} GB HBM" if hbm > 0 else "CPU mode"
            print(f"multi-pass: {mode}, models {self.selected_models}, "
                  f"{len(self.passes)} pass(es): {self.passes}")
        return self.passes

    # ------------------------------------------------------------- chunk IO

    def _load_chunk(self, paths):
        """Decode + EXIF for one chunk. Returns (paths, images, pils, exif).

        JPEGs decode through the native parallel decoder when built
        (native/facet_io.cpp); everything else (PNG/RAW/decoder-less builds)
        takes the PIL path.
        """
        from PIL import Image as PILImage

        from facet_tpu.utils import native_decode

        t0 = time.time()
        images, pils, ok = [], [], []
        jpeg_idx = [i for i, p in enumerate(paths)
                    if p.lower().endswith((".jpg", ".jpeg"))]
        native = None
        if jpeg_idx and native_decode.available():
            native = dict(zip(jpeg_idx, native_decode.decode_jpeg_batch(
                [paths[i] for i in jpeg_idx]) or []))
        for i, path in enumerate(paths):
            arr = native.get(i) if native else None
            if arr is not None:
                pil = PILImage.fromarray(arr)
            else:
                pil = load_image(path)
                if pil is None:
                    self.load_errors[path] = "failed to decode"
                    print(f"  skip {os.path.basename(path)}: failed to decode")
                    continue
                arr = np.asarray(pil, dtype=np.uint8)
            if arr.ndim != 3 or arr.shape[2] != 3 or min(arr.shape[:2]) < 3:
                self.load_errors[path] = f"unsupported shape {arr.shape}"
                print(f"  skip {os.path.basename(path)}: "
                      f"unsupported shape {arr.shape}")
                continue
            ok.append(path)
            images.append(arr)
            pils.append(pil)
        exif = get_exif_batch(ok) if ok else {}
        self.phase_times["io"] += time.time() - t0
        return ok, images, pils, exif

    # ---------------------------------------------------------------- passes

    def _load_with_fallback(self, name):
        """Load a model, walking its unavailability fallback chain.

        The requested->actual resolution is cached so an unavailable
        model's chain (and its warnings) only walks once per run, and so
        _unload_pass_group can unload the model that ACTUALLY loaded —
        unloading by requested name leaves a fallback resident in HBM
        across later bin-packed passes (round-4 review finding)."""
        if name in self._resolved:
            actual = self._resolved[name]
            if actual is None:
                return None, None
            return actual, self.models.load_model(actual)
        chain = [name] + FALLBACK_CHAINS.get(name, [])
        for candidate in chain:
            try:
                model = self.models.load_model(candidate)
                self._resolved[name] = candidate
                return candidate, model
            except Exception as exc:
                tail = FALLBACK_CHAINS.get(candidate, [])
                nxt = f"; trying {tail[0]}" if tail else "; skipping"
                print(f"  pass {candidate}: unavailable ({exc}){nxt}")
        self._resolved[name] = None
        return None, None

    def _run_pass_group(self, group, state):
        """Run one pass group's models over the chunk state."""
        for requested in group:
            # members already satisfied by the joint-dispatch rider path
            # need no load here at all: re-resolving would add the (cached)
            # load time to phase_times['model_load'] a second time and mask
            # that the member was served by the rider (round-4 advisor)
            if requested in QUALITY_PASS_MODELS and state.get("topiq") is not None:
                continue
            if requested == "samp_net" and state.get("samp") is not None:
                continue
            t0 = time.time()
            name, model = self._load_with_fallback(requested)
            if model is None:
                continue
            self.phase_times["model_load"] += time.time() - t0

            t0 = time.time()
            if name == "clip":
                results = model.score_batch(state["images"])
                state["aesthetics"] = results
            elif name in QUALITY_PASS_MODELS:
                if state.get("topiq") is None:   # not already ridden jointly
                    state["topiq"] = model.score_batch(state["images"])
                    state["quality_model"] = name
            elif name == "samp_net":
                if state.get("samp") is None:    # not already ridden jointly
                    state["samp"] = model.score_batch(state["images"])
            elif name in ("insightface",):
                state["faces"] = model.analyze_batch(
                    state["images"],
                    detections=state.pop("face_detections", None))
            elif name in ("vlm_tagger", "qwen3_vl_tagger", "ram_tagger"):
                state["vlm_tags"] = model.tag_batch(state["pils"])
            self.phase_times["inference"] += time.time() - t0

    def _run_fused_clip_pass(self, group, state):
        """The clip slot of one pass group: the FUSED program — aesthetic +
        embedding + pHash + technical statistics in one device call per
        shape. Every other member bin-packed into the SAME group (the
        co-residency the HBM budget actually guarantees) rides the same
        resident batch: SCRFD detection via `face_pipeline` (the faces
        step reuses the prefetched detections via state["face_detections"]),
        TOPIQ and SAMP via the rider protocol. The full-resolution image
        batch then crosses the host->device link ONCE per chunk for the
        whole group instead of once per member, and all programs are
        dispatched back-to-back with a single fetch (the pipelined
        dispatch discipline of docs/PERF.md)."""
        face_model = None
        if "insightface" in group:
            t0 = time.time()
            name, face_model = self._load_with_fallback("insightface")
            if name != "insightface":
                face_model = None
            self.phase_times["model_load"] += time.time() - t0
        riders = {}
        rider_names = {}
        for requested in group:
            slot = ("quality" if requested in QUALITY_PASS_MODELS
                    else "samp" if requested == "samp_net" else None)
            if slot is None or slot in riders:
                continue
            t0 = time.time()
            name, model = self._load_with_fallback(requested)
            self.phase_times["model_load"] += time.time() - t0
            # a fallback may resolve to a model without the rider protocol
            # (e.g. musiq) — it then runs through the normal pass path
            if model is not None and hasattr(model, "rider"):
                riders[slot] = model
                rider_names[slot] = name
        t0 = time.time()
        fused = self.scorer._fused_scorer()
        if face_model is not None or riders:
            outputs, detections, rider_out = fused.score_images(
                state["images"], face_pipeline=face_model, riders=riders)
            if face_model is not None:
                state["face_detections"] = detections
            if "quality" in rider_out:
                state["topiq"] = rider_out["quality"]
                state["quality_model"] = rider_names["quality"]
            if "samp" in rider_out:
                state["samp"] = rider_out["samp"]
        else:
            outputs = fused.score_images(state["images"])
        state["tech"] = [self.scorer.technical.metrics_from_stats(o[3])
                         for o in outputs]
        state["phash"] = [o[2] for o in outputs]
        state["aesthetics"] = [(o[0], o[1]) for o in outputs]
        self.phase_times["inference"] += time.time() - t0

    def _unload_pass_group(self, group):
        t0 = time.time()
        for name in group:
            self.models.unload_model(self._resolved.get(name) or name)
            if name == "clip":
                # the fused scorer holds its own device references to the
                # CLIP params — drop them or the unload frees nothing
                self.scorer.release_fused()
        self.phase_times["unload"] += time.time() - t0

    # ----------------------------------------------------------- chunk logic

    def _device_prepass(self, state):
        """Technical stats + pHash (always-on device work, not model-gated)."""
        from facet_tpu.ops.stats import compute_batch_stats

        t0 = time.time()
        fast = (bool(self.config.get_processing_settings().get(
            "fast_color_harmony", False))
            or self.config.speed_tier() == "fast")
        stats = compute_batch_stats(state["images"],
                                    hs_subsample=4 if fast else 1)
        state["tech"] = [self.scorer.technical.metrics_from_stats(s) for s in stats]
        state["phash"] = phash_batch(state["images"])
        self.phase_times["inference"] += time.time() - t0

    # ---------------------------------------------------------------- public

    def process_directory(self, paths, verbose=True):
        """Score a list of paths chunk by chunk. Returns processed count.

        Host decode for chunk N+1 runs on a background thread while chunk N
        occupies the device (double-buffered ingest).
        """
        from concurrent.futures import ThreadPoolExecutor

        if self.passes is None:
            self.detect_and_configure(verbose=verbose)
        reporter = MetricsReporter(len(paths), label="multi-pass scan")
        self.monitor.chunk_size = self.chunk_size
        self.monitor.start()
        processed = 0
        executor = ThreadPoolExecutor(max_workers=1)
        try:
            pos = 0
            pending = None
            while pos < len(paths) or pending is not None:
                if pending is None:
                    size = max(1, self.monitor.chunk_size)
                    chunk = paths[pos:pos + size]
                    pos += len(chunk)
                    pending = executor.submit(self._load_chunk, chunk)
                loaded = pending.result()
                pending = None
                if pos < len(paths):
                    size = max(1, self.monitor.chunk_size)
                    nxt = paths[pos:pos + size]
                    pos += len(nxt)
                    pending = executor.submit(self._load_chunk, nxt)
                processed += self._process_loaded_chunk(*loaded)
                reporter.update(processed=processed)
        finally:
            executor.shutdown(wait=False)
            self.monitor.stop()
        if verbose:
            reporter.summary(self.phase_times, self.models.cache_stats())
        return processed

    def _process_chunk(self, paths):
        """Full per-chunk pipeline: IO, device prepass, model passes, save."""
        return self._process_loaded_chunk(*self._load_chunk(paths))

    def _process_loaded_chunk(self, ok, images, pils, exif):
        """Device passes + aggregation + save over a pre-decoded chunk."""
        if not ok:
            return 0
        n = len(ok)
        state = {"paths": ok, "images": images, "pils": pils,
                 "aesthetics": [(None, None)] * n, "faces": [None] * n,
                 "topiq": None, "samp": None, "vlm_tags": None}

        uses_clip = any("clip" in group for group in self.passes)
        if not uses_clip:
            self._device_prepass(state)

        multiple_passes = len(self.passes) > 1
        for group in self.passes:
            if uses_clip and "clip" in group:
                # the clip pass runs INSIDE its bin-packed group (not as a
                # chunk-level prepass) so the fused program's HBM share is
                # resident only while its group runs — running it earlier
                # would co-residence it with group 0's models, which the
                # first-fit-decreasing budget never allowed for
                # (sixth-review-pass finding)
                self._run_fused_clip_pass(group, state)
            self._run_pass_group(
                [m for m in group if not (uses_clip and m == "clip")], state)
            if multiple_passes:
                self._unload_pass_group(group)

        t0 = time.time()
        tag_lists = [[] for _ in range(n)]
        if state["vlm_tags"] is not None:
            # VLM/RAM taggers return plain tag names; normalize to the
            # (tag, score) pair shape the row assembly expects
            tag_lists = [[(t, 1.0) for t in tags] for tags in state["vlm_tags"]]
        elif self.config.get_tagging_settings().get("enabled", True):
            blobs = [b for _, b in state["aesthetics"]]
            if any(b is not None for b in blobs):
                present = [b for b in blobs if b is not None]
                tagged = iter(self.scorer.tagger.tag_embedding_bytes(present))
                tag_lists = [next(tagged) if b is not None else [] for b in blobs]

        # chunk thumbnails through the native threaded encoder when built
        # (area resize + libjpeg across cores — ~22 ms/img of single-core
        # PIL work was the largest host-epilogue cost in the round-5
        # engine probe); per-image PIL fallback otherwise
        from facet_tpu.utils import native_decode

        thumbs = native_decode.encode_thumbnail_batch(
            images, self.scorer.thumb_size, self.scorer.thumb_quality)
        if thumbs is None:
            thumbs = [None] * n

        rows = []
        for i, path in enumerate(ok):
            # quality + SAMP results go INTO row assembly so the aggregate is
            # computed from them (the quality model's score replaces the CLIP
            # aesthetic, as in the reference's update_quality_scores —
            # processing/scorer.py:1755-1765)
            rows.append(self.scorer.assemble_row(
                path, images[i], pils[i], exif.get(path, {}), state["tech"][i],
                state["phash"][i], state["aesthetics"][i], state["faces"][i],
                tag_lists[i],
                quality_score=None if state["topiq"] is None else state["topiq"][i],
                quality_model=state.get("quality_model"),
                samp_result=None if state["samp"] is None else state["samp"][i],
                thumbnail=thumbs[i]))
        self.phase_times["aggregate"] += time.time() - t0

        t0 = time.time()
        self.scorer.save_photos_batch(rows, update_only=self._update_only)
        self.phase_times["save"] += time.time() - t0
        return n

    def run_single_pass(self, paths, pass_name, verbose=True):
        """--pass quality|tags|composition|faces|embeddings over paths.

        Existing rows only have the pass's own columns (plus the
        always-recomputed prepass columns) overwritten; aggregates and
        categories then recompute from the MERGED rows so the written
        aggregate reflects stored scores from other passes rather than
        defaults (see MODEL_COLUMNS above for the reference divergence)."""
        if pass_name not in PASS_NAMES:
            raise ValueError(f"unknown pass '{pass_name}' "
                             f"(choose from {sorted(PASS_NAMES)})")
        self.selected_models = [m for m in PASS_NAMES[pass_name]
                                if m in self.models._factories]
        self.passes = self.models.group_passes(self.selected_models)
        if verbose:
            print(f"single pass '{pass_name}': models {self.selected_models}")
        allowed = set(PREPASS_COLUMNS)
        for m in self.selected_models:
            allowed.update(MODEL_COLUMNS.get(m, ()))
            for fb in FALLBACK_CHAINS.get(m, ()):
                allowed.update(MODEL_COLUMNS.get(fb, ()))
        self._update_only = allowed
        try:
            done = self.process_directory(paths, verbose=verbose)
        finally:
            self._update_only = None
        if done:
            self.scorer.update_all_aggregates(
                rescore_embeddings=False, verbose=verbose,
                paths=[os.path.abspath(p) for p in paths])
        return done

    @staticmethod
    def list_available_models():
        from facet_tpu.models.model_manager import ModelManager

        rows = ModelManager.list_available_models()
        print(f"{'model':<18} {'task':<12} {'SRCC':<6} {'HBM GB':<7} description")
        for name, task, srcc, hbm, desc in rows:
            srcc_s = f"{srcc:.2f}" if srcc else "-"
            hbm_s = f"{hbm:.1f}" if hbm else "-"
            print(f"{name:<18} {task:<12} {srcc_s:<6} {hbm_s:<7} {desc}")
        return rows
