"""IQA model registry: the pyiqa role (reference: models/pyiqa_scorer.py).

Registry of no-reference quality scorers with their score ranges and
published KonIQ-10k SRCC, mirroring the reference's table
(pyiqa_scorer.py:32-75 / multi_pass.py:989-1028):

- topiq     (0.93) — native flax CFANet, facet_tpu.models.topiq;
- clipiqa+  (0.86) — antonym-prompt CLIP scoring on our CLIP towers;
- hyperiqa  (0.90), dbcnn (0.90) — native flax ports, iqa_extra.py;
- musiq     (0.87) — native flax multi-scale transformer, musiq.py (raw
  scores on the published 0-100 KonIQ MOS scale).

All scorers expose score_batch(images_u8) -> [0-10 scores] and normalize via
their declared range like the reference (pyiqa_scorer.py:166-195); inputs are
capped at 1024px long edge to bound activation memory (pyiqa_scorer.py:131).
"""

import jax
import jax.numpy as jnp
import numpy as np

MAX_LONG_EDGE = 1024


class CLIPIQAScorer:
    """CLIP-IQA+: quality = softmax similarity to antonym prompt pairs.

    Public method (Wang et al., CLIP-IQA): cosine similarity of the image
    embedding against "good photo"/"bad photo" style prompt pairs, softmaxed
    per pair and averaged.
    """

    PROMPT_PAIRS = [
        ("a good photo", "a bad photo"),
        ("a sharp photo", "a blurry photo"),
        ("a well-exposed photo", "a poorly exposed photo"),
    ]
    score_range = (0.0, 1.0)

    def __init__(self, config=None, cached=None):
        from facet_tpu.models.aesthetic import AestheticScorer
        from facet_tpu.models.checkpoints import (
            clip_vision_config_from,
            load_clip_vision_params,
        )
        from facet_tpu.models.tagger import _pseudo_embedding

        clip_settings = config.get_clip_settings() if config else {}
        vcfg = clip_vision_config_from(clip_settings)
        vision, head = load_clip_vision_params(cached, vcfg)
        self._clip = AestheticScorer(vision_params=vision, head_params=head,
                                     config=vcfg)
        # prompt embeddings: converted text-tower asset or pseudo fallback
        self._pairs = self._build_pairs(vcfg.projection_dim)

    def _build_pairs(self, dim):
        import os

        prompts = [p for pair in self.PROMPT_PAIRS for p in pair]
        from facet_tpu.models.checkpoints import PRETRAINED_DIR

        path = os.path.join(PRETRAINED_DIR, "tag_embeddings.npz")
        stored = {}
        if os.path.exists(path):
            data = np.load(path, allow_pickle=True)
            stored = {p: e for p, e in zip(data["prompts"], data["embeddings"])}
        from facet_tpu.models.tagger import _pseudo_embedding

        emb = np.stack([stored.get(p, _pseudo_embedding(p, dim))
                        for p in prompts]).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        return emb.reshape(len(self.PROMPT_PAIRS), 2, dim)

    def host_params(self):
        return self._clip.host_params()

    def score_batch(self, images_u8):
        if not images_u8:
            return []
        crops = jnp.asarray(self._clip.preprocess(images_u8))
        _, embeddings = jax.device_get(self._clip.score_crops(crops))
        embeddings = np.asarray(embeddings)                 # (B, D) normalized
        sims = np.einsum("bd,pkd->bpk", embeddings, self._pairs) * 100.0
        exp = np.exp(sims - sims.max(axis=2, keepdims=True))
        probs = exp[:, :, 0] / exp.sum(axis=2)              # P(positive prompt)
        quality = probs.mean(axis=1)
        return [round(float(q) * 10.0, 2) for q in quality]

    @classmethod
    def create(cls, config=None, cached=None):
        return cls(config, cached)


def _pending(name, srcc):
    class _Pending:
        @classmethod
        def create(cls, config=None, cached=None):
            raise RuntimeError(
                f"IQA model '{name}' (SRCC {srcc}) is registered but its"
                " native port is pending checkpoint conversion; use 'topiq'"
                " or 'clipiqa+'")

    return _Pending


def _topiq_factory():
    from facet_tpu.models.topiq import TOPIQScorer

    return TOPIQScorer


def _hyperiqa_factory():
    from facet_tpu.models.iqa_extra import HyperIQAScorer

    return HyperIQAScorer


def _dbcnn_factory():
    from facet_tpu.models.iqa_extra import DBCNNScorer

    return DBCNNScorer


def _musiq_factory():
    from facet_tpu.models.musiq import MUSIQScorer

    return MUSIQScorer


IQA_REGISTRY = {
    "topiq": {"srcc": 0.93, "range": (0.0, 1.0), "factory": _topiq_factory},
    "clipiqa+": {"srcc": 0.86, "range": (0.0, 1.0), "factory": lambda: CLIPIQAScorer},
    "hyperiqa": {"srcc": 0.90, "range": (0.0, 1.0), "factory": _hyperiqa_factory},
    "dbcnn": {"srcc": 0.90, "range": (0.0, 1.0), "factory": _dbcnn_factory},
    "musiq": {"srcc": 0.87, "range": (0.0, 100.0), "factory": _musiq_factory},
}


def create_iqa_scorer(name, config=None, cached=None):
    entry = IQA_REGISTRY.get(name)
    if entry is None:
        raise KeyError(f"unknown IQA model '{name}'"
                       f" (known: {sorted(IQA_REGISTRY)})")
    return entry["factory"]().create(config, cached)


def cap_long_edge(image, limit=MAX_LONG_EDGE):
    """Downscale so the long edge <= limit (activation-memory bound)."""
    import cv2

    h, w = image.shape[:2]
    long_edge = max(h, w)
    if long_edge <= limit:
        return image
    scale = limit / long_edge
    return cv2.resize(image, (round(w * scale), round(h * scale)),
                      interpolation=cv2.INTER_AREA)
