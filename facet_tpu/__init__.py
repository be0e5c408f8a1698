"""facet_tpu — a TPU-native photo analysis engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the Facet photo
analysis engine (reference: rlorenzo/facet): a CLI + HTTP API that scans photo
libraries, scores every image with an ensemble of vision models (aesthetic
quality, composition, semantic tags, faces, classical technical metrics),
classifies photos into content categories, combines everything into a
config-driven weighted aggregate score, and persists metrics + embeddings +
thumbnails into a single SQLite database.

Architecture (TPU-first, not a port):

- ``facet_tpu.ops``        — batched XLA/Pallas device kernels for the classical
                             metric suite (histogram reductions, Laplacian/
                             Immerkaer stencils, pHash DCT) with float64 host
                             epilogues for exact numeric parity.
- ``facet_tpu.models``     — flax/JAX implementations of the NN ensemble
                             (CLIP ViT-L/14, aesthetic MLP head, SAMP-Net +
                             U2-Net-P, TOPIQ, SCRFD/ArcFace).
- ``facet_tpu.parallel``   — device mesh + sharding helpers (SPMD batch data
                             parallelism over ICI; optional tensor sharding).
- ``facet_tpu.processing`` — the scoring engine: chunked multi-pass scheduler
                             (HBM-budget bin packing), streaming batch pipeline.
- ``facet_tpu.db``         — SQLite persistence, schema-compatible with the
                             reference (db/schema.py:14-277).
- ``facet_tpu.config``     — v4.0 category-centric scoring configuration.
- ``facet_tpu.web``        — stdlib WSGI micro-framework + JSON API routers.
"""

import os as _os

if _os.environ.get("FACET_PLATFORM"):
    # Harnesses that register a TPU backend at interpreter start can pin the
    # platform before JAX_PLATFORMS is consulted; this is the reliable
    # override (e.g. FACET_PLATFORM=cpu for hardware-free runs).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FACET_PLATFORM"])

__version__ = "0.1.0"

DEFAULT_DB_PATH = "photo_scores_pro.db"
