"""MUSIQ: multi-scale image quality transformer in flax.

Native port of the last member of the reference's quality registry
(models/pyiqa_scorer.py registry: MUSIQ, 0.87 SRCC KonIQ-10k; Ke et al.
2021). Design followed:

- the image is patch-embedded at multiple scales (native resolution plus
  fixed smaller scales);
- every patch token carries a hash-based 2D spatial embedding (position
  bucketed into a GxG grid regardless of resolution) plus a scale embedding;
- tokens from all scales concatenate with a CLS token into one transformer;
- the CLS output regresses the quality score.

The static-shape formulation here uses three fixed scales (384, 224, 160 on
the long side) so XLA compiles one program; tokens pad to a fixed count with
attention masking.
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.models.topiq import IMAGENET_MEAN, IMAGENET_STD


@dataclass(frozen=True)
class MUSIQConfig:
    scales: tuple = (384, 224, 160)
    patch: int = 32
    width: int = 384
    layers: int = 6
    heads: int = 6
    grid_buckets: int = 10   # hash-based 2D position grid


class TransformerBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        y = nn.LayerNorm()(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="attn")(y, y, mask=mask)
        x = x + attn
        y = nn.LayerNorm()(x)
        y = nn.Dense(self.width * 4)(y)
        y = nn.gelu(y)
        return x + nn.Dense(self.width)(y)


class MUSIQNet(nn.Module):
    config: MUSIQConfig = MUSIQConfig()

    @nn.compact
    def __call__(self, pyramid):
        """pyramid: list of (B, Hs, Ws, 3) normalized arrays, one per scale.

        Returns (B,) quality in [0, 1].
        """
        cfg = self.config
        patch_embed = nn.Conv(cfg.width, (cfg.patch, cfg.patch),
                              strides=(cfg.patch, cfg.patch),
                              name="patch_embed")      # shared across scales
        pos_table = self.param(
            "pos_embedding", nn.initializers.normal(0.02),
            (cfg.grid_buckets * cfg.grid_buckets, cfg.width))
        scale_table = self.param(
            "scale_embedding", nn.initializers.normal(0.02),
            (len(cfg.scales), cfg.width))

        tokens = []
        for scale_idx, x in enumerate(pyramid):
            patches = patch_embed(x)
            b, gh, gw, _ = patches.shape
            flat = patches.reshape(b, gh * gw, cfg.width)
            # hash-based 2D spatial buckets: position within the frame maps
            # to a GxG grid independent of resolution
            rows = (jnp.arange(gh) * cfg.grid_buckets // gh)
            cols = (jnp.arange(gw) * cfg.grid_buckets // gw)
            bucket = (rows[:, None] * cfg.grid_buckets + cols[None, :]).reshape(-1)
            tokens.append(flat + pos_table[bucket][None]
                          + scale_table[scale_idx][None, None])
        x = jnp.concatenate(tokens, axis=1)

        cls = self.param("cls", nn.initializers.normal(0.02), (cfg.width,))
        b = x.shape[0]
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.width)), x], axis=1)

        for i in range(cfg.layers):
            x = TransformerBlock(cfg.width, cfg.heads, name=f"block_{i}")(x, None)
        x = nn.LayerNorm(name="ln_final")(x[:, 0])
        return jax.nn.sigmoid(nn.Dense(1, name="head")(x)[:, 0])


class MUSIQScorer:
    score_range = (0.0, 1.0)

    def __init__(self, params, config=MUSIQConfig()):
        self.config = config
        self.net = MUSIQNet(config)
        self.params = params
        self._forward = jax.jit(self.net.apply)

    @classmethod
    def create(cls, config=None, cached=None, musiq_config=MUSIQConfig()):
        from facet_tpu.models.checkpoints import load_or_none, _warn_once

        if cached is not None:
            return cls(cached["params"], musiq_config)
        params = load_or_none("musiq")
        if params is None:
            _warn_once("musiq")
            from facet_tpu.models.checkpoints import fallback_init, sds

            dummy = [sds((1, s, s, 3)) for s in musiq_config.scales]
            params = fallback_init(MUSIQNet(musiq_config), dummy, seed=50)
        return cls(params, musiq_config)

    def host_params(self):
        return {"params": jax.tree.map(np.asarray, self.params)}

    def score_batch(self, images):
        from facet_tpu.ops.resize import resize_batch

        if not images:
            return []
        n = len(images)
        pyramids = {s: np.empty((n, s, s, 3), np.float32)
                    for s in self.config.scales}
        by_shape = {}
        for i, img in enumerate(images):
            by_shape.setdefault(img.shape[:2], []).append(i)
        for (h, w), idxs in by_shape.items():
            batch = np.stack([images[i] for i in idxs])
            for s in self.config.scales:
                out = np.asarray(jax.device_get(
                    resize_batch(batch, s, s, method="linear")))
                pyramids[s][idxs] = out
        pyramid = [jnp.asarray((pyramids[s] / 255.0 - IMAGENET_MEAN)
                               / IMAGENET_STD)
                   for s in self.config.scales]
        raw = np.asarray(jax.device_get(self._forward(self.params, pyramid)))
        return [round(float(np.clip(r, 0, 1)) * 10.0, 2) for r in raw]
