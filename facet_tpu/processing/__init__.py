"""The scoring engine: batch orchestration over the device ensemble.

- Facet (scorer.py)              — core engine: full per-batch pipeline,
                                   aggregate math, persistence, recompute.
- ChunkedMultiPassProcessor      — default scan mode: per-chunk host IO once,
  (multi_pass.py)                  ensemble members in HBM-budgeted passes.
- BatchProcessor                 — streaming single-pass mode with worker
  (batch_processor.py)             threads feeding the device.
- ResourceMonitor                — RAM/chunk auto-tuning daemons.
- MetricsReporter                — throttled progress lines + final summary.
"""

from facet_tpu.processing.scorer import Facet

__all__ = ["Facet"]
