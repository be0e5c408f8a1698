"""Fused single-program scoring pipeline.

One jitted XLA program per input shape computes EVERYTHING the ensemble needs
from a raw uint8 batch: the technical statistics histograms, the pHash bits,
the CLIP crop (separable-matmul resize), the ViT forward and the aesthetic
head. One host->device transfer in, a few KB of results out — the TPU-first
shape of the engine's hot path (vs the reference's per-stage host round
trips).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.models.aesthetic import AestheticHead
from facet_tpu.models.clip import CLIP_MEAN, CLIP_STD, CLIPVisionTower
from facet_tpu.ops.phash import HASH_SIZE, RESIZE, _area_weights, _dct_matrix
from facet_tpu.ops.resize import clip_preprocess_matrices
from facet_tpu.ops.stats import _batch_stats_impl


def build_fused_pipeline(vision_tower: CLIPVisionTower, head: AestheticHead,
                         src_h, src_w):
    """-> jitted fn(vision_params, head_params, uint8 batch) for one shape.

    Returns per image: aesthetic score, normalized embedding, phash bits,
    gray/sat histograms, HS entropy, Laplacian + Immerkaer histograms.
    """
    target = vision_tower.config.image_size
    rows, cols = clip_preprocess_matrices(src_h, src_w, target)
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    hash_rows = jnp.asarray(_area_weights(src_h, RESIZE))
    hash_cols = jnp.asarray(_area_weights(src_w, RESIZE))
    dct = jnp.asarray(_dct_matrix())

    @jax.jit
    def pipeline(vision_params, head_params, batch_u8):
        # --- classical statistics (compare-reduce + tiled sums + MXU hist)
        (gray_hist, sat_tiles, entropy,
         lap_tiles, lapsq_tiles, imm_tiles) = _batch_stats_impl(batch_u8)

        fbatch = batch_u8.astype(jnp.float32)

        # --- pHash: area resize + DCT as matmuls
        gray = (fbatch[..., 0] * 9798 + fbatch[..., 1] * 19235 +
                fbatch[..., 2] * 3735 + 16384) // 32768
        small = jnp.einsum("rh,bhw,cw->brc", hash_rows, gray, hash_cols)
        freq = dct @ small @ dct.T
        low = freq[:, :HASH_SIZE, :HASH_SIZE].reshape(-1, HASH_SIZE * HASH_SIZE)
        med = jnp.median(low, axis=1, keepdims=True)
        hash_bits = low > med

        # --- CLIP aesthetic: resize-crop + normalize + ViT + head
        crops = jnp.einsum("rh,bhwc->brwc", rows, fbatch)
        crops = jnp.einsum("sw,brwc->brsc", cols, crops)
        x = crops / 255.0
        x = (x - CLIP_MEAN) / CLIP_STD
        features = vision_tower.apply(vision_params, x)
        raw = head.apply(head_params, features)[:, 0]
        scores = jnp.clip((raw + 1.0) * 5.0, 0.0, 10.0)
        embeddings = features / jnp.linalg.norm(features, axis=-1, keepdims=True)

        return {
            "aesthetic": scores,
            "embedding": embeddings,
            "hash_bits": hash_bits,
            "gray_hist": gray_hist,
            "sat_tiles": sat_tiles,
            "hs_entropy": entropy,
            "lap_tiles": lap_tiles,
            "lapsq_tiles": lapsq_tiles,
            "imm_tiles": imm_tiles,
        }

    return pipeline


@functools.lru_cache(maxsize=32)
def _cached_matrices(src_h, src_w, target):
    return clip_preprocess_matrices(src_h, src_w, target)
