"""Zero-shot CLIP tagger over the config vocabulary.

Semantics follow the reference (models/tagger.py:51-158): each tag has
synonym prompts rendered as "a photo of {synonym}"; prompt text embeddings
are precomputed and L2-normalized; a photo's stored CLIP embedding is scored
by cosine similarity, each tag takes the max over its synonyms, tags above
the threshold (default 0.22) are kept, sorted, and truncated to max_tags.

TPU-first: tagging a whole library is a single (N, 768) @ (768, P) matmul
plus a segment-max — one device call for any N.

Prompt embeddings come from, in order of preference:
1. a precomputed asset (``pretrained_models/tag_embeddings.npz``) produced by
   tools/convert_checkpoints.py from a real CLIP text tower;
2. the in-repo CLIP text tower, when its weights + tokenizer are available;
3. a deterministic hash-seeded pseudo-embedding per prompt (offline fallback
   that keeps the full pipeline runnable; scores are not semantically
   meaningful but are stable across runs).
"""

import functools
import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np


def _pseudo_embedding(text, dim):
    seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "little")
    vec = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
    return vec / np.linalg.norm(vec)


@functools.partial(jax.jit, static_argnames=("num_tags",))
def _similarity_kernel(photo_embeddings, prompt_matrix, segment_ids, num_tags):
    """(N, D) x (D, P) -> per-tag max similarity (N, T)."""
    sims = photo_embeddings @ prompt_matrix                     # (N, P)
    one_hot = jax.nn.one_hot(segment_ids, num_tags, dtype=sims.dtype)  # (P, T)
    # segment max via masked broadcast: (N, P, 1) with (P, T) mask
    masked = jnp.where(one_hot[None] > 0, sims[:, :, None], -jnp.inf)
    return jnp.max(masked, axis=1)                              # (N, T)


class CLIPTagger:
    def __init__(self, config, text_encoder=None, embedding_dim=768,
                 assets_path="pretrained_models/tag_embeddings.npz"):
        self.config = config
        clip_settings = config.get_clip_settings()
        self.threshold = clip_settings.get("similarity_threshold_percent", 22) / 100
        self.max_tags = config.get_tagging_settings().get("max_tags", 5)
        self.vocabulary = config.get_tag_vocabulary()   # {tag: [synonyms]}
        self.embedding_dim = embedding_dim

        self.tags = list(self.vocabulary.keys())
        prompts, segment_ids = [], []
        for t, tag in enumerate(self.tags):
            synonyms = self.vocabulary[tag] or [tag]
            for syn in synonyms:
                prompts.append(f"a photo of {syn}")
                segment_ids.append(t)
        self.prompts = prompts
        self.segment_ids = np.asarray(segment_ids, np.int32)
        self.prompt_matrix = self._build_prompt_matrix(text_encoder, assets_path)

    def _build_prompt_matrix(self, text_encoder, assets_path):
        if assets_path and os.path.exists(assets_path):
            data = np.load(assets_path, allow_pickle=True)
            stored = {p: e for p, e in zip(data["prompts"], data["embeddings"])}
            if all(p in stored for p in self.prompts):
                mat = np.stack([stored[p] for p in self.prompts])
                return mat.T.astype(np.float32)
        if text_encoder is not None:
            emb = text_encoder(self.prompts)                     # (P, D)
            emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
            return emb.T.astype(np.float32)
        mat = np.stack([_pseudo_embedding(p, self.embedding_dim)
                        for p in self.prompts])
        return mat.T.astype(np.float32)

    # -------------------------------------------------------------- public

    def tag_embeddings(self, embeddings):
        """(N, D) float32 normalized photo embeddings -> list of tag lists.

        Each result is [(tag, similarity)], thresholded and truncated.
        """
        if len(embeddings) == 0:
            return []
        sims = np.asarray(jax.device_get(_similarity_kernel(
            jnp.asarray(embeddings, jnp.float32),
            jnp.asarray(self.prompt_matrix),
            jnp.asarray(self.segment_ids),
            len(self.tags),
        )))
        results = []
        for row in sims:
            hits = [(self.tags[t], float(row[t]))
                    for t in np.nonzero(row >= self.threshold)[0]]
            hits.sort(key=lambda kv: kv[1], reverse=True)
            results.append(hits[: self.max_tags])
        return results

    def tag_embedding_bytes(self, blobs):
        """List of stored embedding blobs -> list of tag lists."""
        embeddings = np.stack([
            np.frombuffer(b, dtype=np.float32) for b in blobs
        ]) if blobs else np.zeros((0, self.embedding_dim), np.float32)
        return self.tag_embeddings(embeddings)

    def tags_to_string(self, tag_hits):
        return ", ".join(tag for tag, _ in tag_hits)

    def is_artwork(self, tag_hits):
        """Art-tag gate (reference tagger.py:146-158)."""
        art = self.config.get_art_tags()
        return any(tag in art for tag, _ in tag_hits)
