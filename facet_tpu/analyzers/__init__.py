"""Analyzers: user-facing metric computation built on the device kernels.

- TechnicalAnalyzer  — the 7 classical metrics (sharpness, color harmony,
  exposure/histogram, monochrome, dynamic range, noise, contrast), batched on
  device with float64 host epilogues for exact reference parity.
- CompositionAnalyzer — subject placement / rule-of-thirds / leading lines.
- FaceAnalyzer        — detection, landmarks, embeddings, blink (EAR).
"""

from facet_tpu.analyzers.technical import TechnicalAnalyzer

__all__ = ["TechnicalAnalyzer"]
