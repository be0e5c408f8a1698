"""Streaming single-pass processor: worker threads feed the device.

Producer/consumer design per the reference (processing/batch_processor.py:
27-604): N loader threads decode images into a bounded queue, the main loop
drains device-sized batches, runs the full ensemble, and batch-saves every
`save_interval` photos. A resource monitor shrinks the batch under memory
pressure and tunes worker count from queue-stall rates.
"""

import queue
import threading
import time

import numpy as np

from facet_tpu.processing.metrics_reporter import MetricsReporter
from facet_tpu.processing.resource_monitor import ResourceMonitor
from facet_tpu.utils.exif import get_exif_batch
from facet_tpu.utils.image_loading import load_image

_SENTINEL = object()


class BatchProcessor:
    def __init__(self, scorer, batch_size=None, num_workers=None, prefetch=3):
        self.scorer = scorer
        processing = scorer.config.get_processing_settings()
        tuning = processing.get("auto_tuning", {})
        self.batch_size = batch_size or processing.get("device_batch_size",
                                                       processing.get("gpu_batch_size", 16))
        self.num_workers = num_workers or processing.get("num_workers", 4)
        self.min_batch = tuning.get("min_gpu_batch_size", 2)
        self.queue = queue.Queue(maxsize=self.batch_size * prefetch)
        self.stalls = 0
        self.load_failures = []

    # ------------------------------------------------------------- pipeline

    def _loader(self, path_iter_lock, path_iter):
        while True:
            with path_iter_lock:
                path = next(path_iter, None)
            if path is None:
                break
            pil = load_image(path)
            if pil is None:
                self.load_failures.append(path)
                continue
            arr = np.asarray(pil, dtype=np.uint8)
            if arr.ndim != 3 or arr.shape[2] != 3 or min(arr.shape[:2]) < 3:
                self.load_failures.append(path)
                continue
            self.queue.put((path, arr, pil))

    def process_stream(self, paths, save_interval=50, verbose=True,
                       calibrate=True):
        """Score paths through the streaming pipeline. Returns count saved.

        A calibration phase (reference: batch_processor.py:458-604) measures
        host decode throughput over the first batches and may grow the worker
        pool via the IO-vs-device tuner before the steady-state run.
        """
        reporter = MetricsReporter(len(paths), label="single-pass scan")
        monitor = ResourceMonitor().start()
        it = iter(paths)
        lock = threading.Lock()
        workers = [threading.Thread(target=self._loader, args=(lock, it), daemon=True)
                   for _ in range(self.num_workers)]
        for w in workers:
            w.start()

        calibration_done = not calibrate
        calibration_start = time.time()

        def maybe_calibrate(processed):
            nonlocal calibration_done
            if calibration_done or processed < 2 * self.batch_size:
                return
            calibration_done = True
            # end-to-end throughput alone cannot distinguish device-bound
            # from IO-bound (it includes scoring time); queue stalls during
            # the window are the IO-bound signal — the consumer actually
            # waited on the decoders. Without stalls, adding loader threads
            # just blocks on a full queue (round-4 review finding).
            if self.stalls == 0:
                if verbose:
                    print("  calibration: device-bound, workers unchanged")
                return
            elapsed = max(time.time() - calibration_start, 1e-6)
            host_rate = processed / elapsed
            from facet_tpu.config.percentile_normalizer import (
                recalculate_batch_settings,
            )

            tuned = recalculate_batch_settings(
                0.0, host_rate, current_workers=self.num_workers)
            extra = tuned["workers"] - self.num_workers
            if extra > 0:
                for _ in range(extra):
                    w = threading.Thread(target=self._loader, args=(lock, it),
                                         daemon=True)
                    w.start()
                    workers.append(w)
                self.num_workers = tuned["workers"]
                if verbose:
                    print(f"  calibration: {tuned['bottleneck']}-bound,"
                          f" workers -> {self.num_workers}")

        pending_rows = []
        processed = 0
        remaining = len(paths)
        try:
            while remaining > 0:
                batch = []
                target = max(self.min_batch, self.batch_size)
                if monitor.reduce_batch_requested:
                    target = max(self.min_batch, int(target * 0.75))
                deadline = time.time() + 10.0
                while len(batch) < target and remaining > len(batch):
                    timeout = max(0.05, deadline - time.time())
                    try:
                        batch.append(self.queue.get(timeout=timeout))
                    except queue.Empty:
                        self.stalls += 1
                        if not any(w.is_alive() for w in workers):
                            break
                        if time.time() >= deadline:
                            break
                failed_now = len(self.load_failures)
                if not batch:
                    # nothing decodable left
                    remaining = 0
                    break
                b_paths = [p for p, _, _ in batch]
                b_imgs = [a for _, a, _ in batch]
                b_pils = [p for _, _, p in batch]
                exif = get_exif_batch(b_paths)
                rows = self.scorer.score_images(b_paths, b_imgs, b_pils, exif)
                pending_rows.extend(rows)
                processed += len(rows)
                remaining = len(paths) - processed - failed_now
                if len(pending_rows) >= save_interval:
                    self.scorer.save_photos_batch(pending_rows)
                    pending_rows = []
                maybe_calibrate(processed)
                reporter.update(processed=processed, queue_stalls=self.stalls,
                                workers=self.num_workers, batch_size=target)
        finally:
            if pending_rows:
                self.scorer.save_photos_batch(pending_rows)
            monitor.stop()
        if verbose:
            reporter.summary()
            if self.load_failures:
                print(f"  {len(self.load_failures)} files failed to load")
        return processed
