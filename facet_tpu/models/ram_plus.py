"""RAM++ (Recognize Anything Plus) open-vocabulary tagger in flax.

The reference wraps the recognize-anything library's ram_plus model
(reference: models/ram_tagger.py:20-38, 96-170 — Swin-L at 384 px, 4,585
tags, per-class thresholds, ~8 GB VRAM) and ships it effectively disabled
(requirements.txt pins it out for memory). This is the TPU-native
equivalent of that architecture so the family has a first-class device
story:

- image encoder: flax Swin-L (models/swin.py), one batched-window program;
- a mean token is prepended as the CLS summary (the library's swin
  forward), everything projected to the 512-wide tag space;
- description reweighting: each tag owns `des_per_class` text embeddings;
  the image CLS picks a per-tag convex combination by softmax similarity
  (the RAM++ "image-conditioned prompt" step) — a single einsum here;
- tag decoding: two cross-attention-only transformer layers (the
  Query2Label-style tagging head — label queries attend the image tokens;
  there is no label-label self-attention, which would be a 4585^2 score
  matrix) followed by a per-class linear probe;
- per-class sigmoid thresholds decide the emitted tags.

Checkpoint weights load through convert.py:convert_ram_plus; the tag list
and thresholds ride alongside the checkpoint directory.
"""

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.models.swin import SwinConfig, SwinTransformer

# RAM++ normalizes with the ImageNet statistics at 384 px
RAM_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
RAM_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class RAMPlusConfig:
    num_class: int = 4585
    des_per_class: int = 51          # LLM tag descriptions per class
    embed_width: int = 512           # CLIP text embedding width
    hidden: int = 768                # tagging-head width
    heads: int = 4
    layers: int = 2
    intermediate: int = 3072
    default_threshold: float = 0.68
    swin: SwinConfig = field(default_factory=SwinConfig)


class CrossOnlyLayer(nn.Module):
    """One tagging-head layer: label queries cross-attend image tokens.

    Post-LayerNorm residual blocks in the BERT layout (attention ->
    output dense + LN, intermediate -> output dense + LN) so torch keys
    map one-to-one.
    """

    hidden: int
    heads: int
    intermediate: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, labels, image, image_mask=None):
        h, heads = self.hidden, self.heads
        head_dim = h // heads
        q = nn.Dense(h, dtype=self.dtype, name="att_query")(labels)
        k = nn.Dense(h, dtype=self.dtype, name="att_key")(image)
        v = nn.Dense(h, dtype=self.dtype, name="att_value")(image)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], heads, head_dim)

        s = jnp.einsum("bqhd,bkhd->bhqk", split(q) * head_dim ** -0.5,
                       split(k), preferred_element_type=jnp.float32)
        if image_mask is not None:
            s = s + jnp.where(image_mask, 0.0, -1e9)[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p, split(v),
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(labels.shape[0], labels.shape[1], h)
        ctx = nn.Dense(h, dtype=self.dtype, name="att_out")(ctx.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="att_norm")(labels + ctx)

        y = nn.Dense(self.intermediate, dtype=self.dtype, name="ffn_in")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(h, dtype=self.dtype, name="ffn_out")(y)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="ffn_norm")(x + y)


class RAMPlusNet(nn.Module):
    config: RAMPlusConfig = field(default_factory=RAMPlusConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, 384, 384, 3) ImageNet-normalized -> (B, num_class) logits."""
        cfg = self.config
        tokens = SwinTransformer(cfg.swin, self.dtype,
                                 name="visual_encoder")(x)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        image = nn.Dense(cfg.embed_width, dtype=self.dtype,
                         name="image_proj")(tokens)     # (B, 145, 512)

        # image-conditioned prompt: CLS similarity softmax over the
        # per-class description embeddings -> one 512-d embed per class
        label_embed = self.param(
            "label_embed", nn.initializers.normal(0.02),
            (cfg.num_class * cfg.des_per_class, cfg.embed_width),
            jnp.float32)
        cls = image[:, 0]
        cls = cls / (jnp.linalg.norm(cls, axis=-1, keepdims=True) + 1e-8)
        des = label_embed / (
            jnp.linalg.norm(label_embed, axis=-1, keepdims=True) + 1e-8)
        scale = jnp.exp(self.param("reweight_scale",
                                   nn.initializers.constant(np.log(1 / 0.07)),
                                   (), jnp.float32))
        sim = scale * jnp.einsum("bc,dc->bd", cls, des)
        sim = sim.reshape(cls.shape[0], cfg.num_class, cfg.des_per_class)
        weights = jax.nn.softmax(sim, axis=-1)
        per_class = label_embed.reshape(cfg.num_class, cfg.des_per_class,
                                        cfg.embed_width)
        queries = jnp.einsum("bnd,ndc->bnc", weights, per_class)

        labels = nn.Dense(cfg.hidden, dtype=self.dtype,
                          name="wordvec_proj")(queries)
        labels = nn.relu(labels)
        for i in range(cfg.layers):
            labels = CrossOnlyLayer(cfg.hidden, cfg.heads, cfg.intermediate,
                                    self.dtype, name=f"tag_layer{i}")(
                                        labels, image)

        w = self.param("fc_w", nn.initializers.normal(0.02),
                       (cfg.num_class, cfg.hidden), jnp.float32)
        b = self.param("fc_b", nn.initializers.zeros,
                       (cfg.num_class,), jnp.float32)
        return jnp.einsum("bnc,nc->bn", labels.astype(jnp.float32), w) + b


def decode_tags(logits, thresholds, tag_list, max_tags=None):
    """(B, num_class) logits + per-class thresholds -> tag-string lists,
    strongest first."""
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float64)))
    out = []
    for row in probs:
        hits = np.flatnonzero(row > thresholds)
        hits = hits[np.argsort(-row[hits])]
        if max_tags is not None:
            hits = hits[:max_tags]
        out.append([tag_list[i] for i in hits])
    return out
