"""CLIP + MLP aesthetic model (the reference's 'clip-mlp' scorer).

Pipeline parity with processing/scorer.py:571-673:
- features = CLIP ViT-L/14 image features (unnormalized) of the 224px
  shortest-side-resized, center-cropped, CLIP-normalized image;
- raw = MLP(768 -> 256 -> relu -> 1)(features);
- aesthetic = clamp((raw + 1) * 5, 0, 10);
- the stored embedding is the L2-normalized feature vector as float32 bytes.

The whole thing — resize matmuls, normalize, ViT forward, head, normalize —
is one jitted device program per input shape; batches shard over the mesh's
data axis.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.models.clip import (
    CLIP_MEAN,
    CLIP_STD,
    CLIPVisionConfig,
    CLIPVisionTower,
)
from facet_tpu.ops.resize import apply_separable_resize, clip_preprocess_matrices


class AestheticHead(nn.Module):
    """The reference's declared MLP (768 -> 256 -> relu -> 1).

    ``normalize_input`` is set when the REAL improved-aesthetic-predictor
    checkpoint is installed (its purely-affine stack is collapsed exactly
    into this structure by models/convert.py convert_aesthetic_head; that
    predictor scores L2-normalized embeddings). Normalizing an
    already-normalized vector is the identity, so the recompute-from-
    stored-embedding path agrees with the fused path in that mode.
    """

    hidden: int = 256
    normalize_input: bool = False

    @nn.compact
    def __call__(self, features):
        if self.normalize_input:
            features = features / jnp.linalg.norm(
                features, axis=-1, keepdims=True)
        x = nn.Dense(self.hidden, dtype=jnp.float32, name="fc1")(features)
        x = nn.relu(x)
        return nn.Dense(1, dtype=jnp.float32, name="fc2")(x)


def head_module_for(head_params):
    """AestheticHead configured for a loaded head tree: the converter
    marks real-checkpoint trees with a ``meta/normalize_input`` leaf."""
    meta = head_params.get("meta", {}) if isinstance(head_params, dict) else {}
    return AestheticHead(
        normalize_input=bool(np.any(np.asarray(
            meta.get("normalize_input", 0.0)))))


class AestheticScorer:
    """End-to-end device scorer: uint8 images -> (aesthetic, embedding)."""

    def __init__(self, vision_params=None, head_params=None,
                 config=CLIPVisionConfig(), dtype=jnp.bfloat16, rng_seed=0):
        self.config = config
        self.vision = CLIPVisionTower(config, dtype)
        self.head = (AestheticHead() if head_params is None
                     else head_module_for(head_params))
        from facet_tpu.models.checkpoints import fallback_init, sds

        if vision_params is None:
            vision_params = fallback_init(
                self.vision, sds((1, config.image_size, config.image_size, 3)),
                seed=rng_seed)
        if head_params is None:
            head_params = fallback_init(
                self.head, sds((1, config.projection_dim)), seed=rng_seed + 1)
        self.vision_params = vision_params
        self.head_params = head_params
        self._forward = jax.jit(self._forward_impl)
        self._head_only = jax.jit(self._head_only_impl)

    # ------------------------------------------------------------ forwards

    def _forward_impl(self, vision_params, head_params, crops):
        """crops: (B, 224, 224, 3) float32 pixels in [0, 255]."""
        x = crops / 255.0
        x = (x - CLIP_MEAN) / CLIP_STD
        features = self.vision.apply(vision_params, x)            # (B, 768) f32
        raw = self.head.apply(head_params, features)[:, 0]
        aesthetic = jnp.clip((raw + 1.0) * 5.0, 0.0, 10.0)
        norm = features / jnp.linalg.norm(features, axis=-1, keepdims=True)
        return aesthetic, norm

    def _head_only_impl(self, head_params, features):
        raw = self.head.apply(head_params, features)[:, 0]
        return jnp.clip((raw + 1.0) * 5.0, 0.0, 10.0)

    # ------------------------------------------------------------- public

    def host_params(self):
        """numpy param trees for the model manager's host-RAM cache."""
        to_host = lambda t: jax.tree.map(np.asarray, t)
        return {"vision": to_host(self.vision_params),
                "head": to_host(self.head_params)}

    def preprocess(self, images_u8):
        """List of RGB uint8 arrays -> (B, 224, 224, 3) f32 crop batch.

        Shortest-side resize + center crop via cached separable matrices.
        """
        crops = np.empty((len(images_u8), self.config.image_size,
                          self.config.image_size, 3), np.float32)
        by_shape = {}
        for i, img in enumerate(images_u8):
            by_shape.setdefault(img.shape[:2], []).append(i)
        for (h, w), idxs in by_shape.items():
            rows, cols = clip_preprocess_matrices(h, w, self.config.image_size)
            batch = np.stack([images_u8[i] for i in idxs])
            out = apply_separable_resize(
                jnp.asarray(batch), jnp.asarray(rows), jnp.asarray(cols))
            crops[idxs] = np.asarray(jax.device_get(out))
        return crops

    def score_batch(self, images_u8):
        """Images -> list of (aesthetic_score, embedding_bytes)."""
        if not images_u8:
            return []
        crops = jnp.asarray(self.preprocess(images_u8))
        scores, embeddings = jax.device_get(
            self._forward(self.vision_params, self.head_params, crops))
        return [
            (float(scores[i]), np.asarray(embeddings[i], np.float32).tobytes())
            for i in range(len(images_u8))
        ]

    def score_crops(self, crops):
        """Pre-preprocessed (B,224,224,3) f32 [0,255] -> (scores, embeddings)."""
        return self._forward(self.vision_params, self.head_params, crops)

    def score_from_embedding(self, embedding_bytes):
        """Recompute the aesthetic score from a stored normalized embedding.

        Matches the reference quirk (scorer.py:622-633): the head was trained
        on unnormalized features but recompute feeds the stored normalized
        embedding — we keep that contract so --recompute-average agrees.
        (With the REAL improved-aesthetic-predictor installed the quirk
        vanishes: the head normalizes internally, normalization is
        idempotent, and this path agrees exactly with the fused path.)
        """
        emb = np.frombuffer(embedding_bytes, dtype=np.float32).reshape(1, -1)
        return float(jax.device_get(self._head_only(self.head_params, jnp.asarray(emb)))[0])

    def score_from_embeddings_batch(self, embedding_matrix):
        """(N, 768) float32 -> (N,) scores, one device call."""
        return np.asarray(jax.device_get(
            self._head_only(self.head_params, jnp.asarray(embedding_matrix))))
