"""MUSIQ: multi-scale image quality transformer in flax — exact architecture.

Native transcription of the last member of the reference's quality registry
(models/pyiqa_scorer.py:54-66 registry entry: MUSIQ, score_range (0, 100),
0.87 SRCC KonIQ-10k; Ke et al., ICCV 2021, google-research/musiq). The
published architecture, as carried by the koniq checkpoint:

- the image is evaluated at THREE scales: aspect-ratio-preserving resizes
  to longer sides 224 and 384, plus the native resolution (the reference
  caps inference at 1024 px on the longer side — pyiqa_scorer.py:132-135 —
  so "native" here is the capped image);
- each scale is cut into 32x32 patches; every patch runs INDEPENDENTLY
  through a 5-layer conv root (weight-standardized 7x7/2 conv -> 32-group
  GroupNorm -> ReLU -> 3x3/2 maxpool, the BiT-style root the paper calls
  the "patch encoding module"), then the 8x8x64 feature flattens into a
  linear embedding of width 384;
- every patch token carries a hash-based 2D spatial embedding (its (row,
  col) within the scale's patch grid buckets into a fixed GxG=10x10 table
  regardless of resolution) plus a per-scale scale embedding;
- tokens from all scales concatenate behind a CLS token into ONE pre-norm
  transformer (14 layers, width 384, MLP 1152, 6 heads);
- the CLS output regresses the raw quality score — 0-100 on the KonIQ MOS
  scale, NO squashing (the reference normalizes to 0-10 by /10:
  models/pyiqa_scorer.py:166-192).

Inputs normalize to [-1, 1] ((x/255 - 0.5) / 0.5, the BiT/ViT value range
the original JAX code uses), NOT ImageNet statistics.

Static-shape formulation: one jit specializes per distinct input
resolution (images group by shape in score_batch, same policy as the other
members); within a shape, every scale pads up to a 32-multiple and all
patch tokens are kept — matching the original's zero-pad-then-patch input
pipeline — so no attention mask is needed.

The converter (models/convert.py convert_musiq) maps the published torch
key vocabulary; an independent torch transcription pins both in
tests/test_convert_musiq.py (HyperIQA/DBCNN pattern, docs/CONVERTERS.md).
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MUSIQConfig:
    patch: int = 32
    hidden: int = 384
    mlp_dim: int = 1152
    layers: int = 14
    heads: int = 6
    grid_buckets: int = 10        # hash-based 2D position grid (G)
    longer_side_lengths: tuple = (224, 384)   # ARP scales, ids 0..k-1
    max_native_side: int = 1024   # reference pyiqa cap (pyiqa_scorer.py:135)
    root_width: int = 64          # conv-root channels

    @property
    def num_scales(self):
        # native resolution takes the LAST scale id (len(longer_sides))
        return len(self.longer_side_lengths) + 1

    @property
    def token_dim(self):
        # conv root downsamples 32x32 -> 8x8 (conv/2 then pool/2)
        return (self.patch // 4) ** 2 * self.root_width


class PatchEncoder(nn.Module):
    """The 5-layer conv root applied per 32x32 patch + linear embedding.

    Weight standardization is applied to the root kernel at call time (the
    checkpoint stores the RAW kernel; BiT/MUSIQ standardize in the forward
    pass), matching the torch transcription in tests/test_convert_musiq.py.
    """

    config: MUSIQConfig

    @nn.compact
    def __call__(self, patches):
        """patches: (N, patch, patch, 3) in [-1, 1] -> (N, hidden)."""
        cfg = self.config
        kernel = self.param(
            "conv_root_kernel", nn.initializers.lecun_normal(),
            (7, 7, 3, cfg.root_width))
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        w = (kernel - mean) * jax.lax.rsqrt(var + 1e-10)
        # torch Conv2d(padding=3) is SYMMETRIC; XLA "SAME" would pad (2,3)
        # on the strided 32->16 root (the ArcFace caveat, docs/CONVERTERS.md)
        x = jax.lax.conv_general_dilated(
            patches, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn_root")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(cfg.hidden, name="embedding")(x)


class TransformerBlock(nn.Module):
    """Pre-norm ViT block: LN -> MHA -> +, LN -> MLP(gelu) -> +."""

    config: MUSIQConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        y = nn.LayerNorm(epsilon=1e-6, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=cfg.heads, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, name="ln2")(x)
        y = nn.Dense(cfg.mlp_dim, name="mlp_dense1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.hidden, name="mlp_dense2")(y)
        return x + y


def _bucket_ids(gh, gw, grid):
    """Hash-based 2D spatial buckets: patch (r, c) of a (gh, gw) grid maps
    to floor(r*G/gh)*G + floor(c*G/gw) — resolution-independent."""
    rows = np.arange(gh) * grid // gh
    cols = np.arange(gw) * grid // gw
    return (rows[:, None] * grid + cols[None, :]).reshape(-1)


class MUSIQNet(nn.Module):
    config: MUSIQConfig = MUSIQConfig()

    @nn.compact
    def __call__(self, pyramid):
        """pyramid: list of (B, Hs, Ws, 3) arrays in [-1, 1], 32-multiple
        spatial dims, ordered [ARP scales in longer_side_lengths order...,
        native]. Returns (B,) raw scores (KonIQ MOS scale, ~0-100)."""
        cfg = self.config
        assert len(pyramid) == cfg.num_scales
        encoder = PatchEncoder(cfg, name="patch_encoder")
        pos_table = self.param(
            "pos_embedding", nn.initializers.normal(0.02),
            (cfg.grid_buckets * cfg.grid_buckets, cfg.hidden))
        scale_table = self.param(
            "scale_embedding", nn.initializers.normal(0.02),
            (cfg.num_scales, cfg.hidden))

        tokens = []
        for scale_idx, x in enumerate(pyramid):
            b, h, w, _ = x.shape
            p = cfg.patch
            assert h % p == 0 and w % p == 0, (h, w)
            gh, gw = h // p, w // p
            # (B, gh, p, gw, p, 3) -> (B*gh*gw, p, p, 3): each patch is
            # encoded independently, as the original extract_patches does
            patches = x.reshape(b, gh, p, gw, p, 3)
            patches = patches.transpose(0, 1, 3, 2, 4, 5)
            patches = patches.reshape(b * gh * gw, p, p, 3)
            emb = encoder(patches).reshape(b, gh * gw, cfg.hidden)
            bucket = _bucket_ids(gh, gw, cfg.grid_buckets)
            tokens.append(emb + pos_table[bucket][None]
                          + scale_table[scale_idx][None, None])
        x = jnp.concatenate(tokens, axis=1)

        cls = self.param("cls", nn.initializers.normal(0.02),
                         (1, 1, cfg.hidden))
        b = x.shape[0]
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden)), x], axis=1)

        for i in range(cfg.layers):
            x = TransformerBlock(cfg, name=f"encoderblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(x[:, 0])
        return nn.Dense(1, name="head")(x)[:, 0]


def _pad32(h):
    return (h + 31) // 32 * 32


def scale_plan(h, w, config=MUSIQConfig()):
    """The per-scale (resize_h, resize_w, pad_h, pad_w) plan for an input
    of shape (h, w): ARP resizes to each longer_side_length, then the
    native (1024-capped) size; every scale zero-pads to 32-multiples."""
    plan = []
    cap = config.max_native_side
    nh, nw = h, w
    if max(nh, nw) > cap:
        s = cap / max(nh, nw)
        nh, nw = max(32, int(nh * s)), max(32, int(nw * s))
    for side in config.longer_side_lengths:
        s = side / max(nh, nw)
        rh, rw = max(1, round(nh * s)), max(1, round(nw * s))
        plan.append((rh, rw, _pad32(rh), _pad32(rw)))
    plan.append((nh, nw, _pad32(nh), _pad32(nw)))
    return plan


class MUSIQScorer:
    """score_batch contract: uint8 HWC images -> 0-10 floats, the
    reference's (raw - 0) / 100 * 10 normalization
    (models/pyiqa_scorer.py:166-192)."""

    score_range = (0.0, 100.0)

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

            dummy = [sds((1, ph, pw, 3))
                     for _, _, ph, pw in scale_plan(64, 96, musiq_config)]
            params = fallback_init(MUSIQNet(musiq_config), dummy, seed=50)
        return cls(params, musiq_config)

    def host_params(self):
        return {"params": jax.tree.map(np.asarray, self.params)}

    def _pyramid(self, batch):
        """(N, H, W, 3) uint8 -> list of [-1, 1] padded scale arrays."""
        from facet_tpu.ops.resize import resize_batch

        n, h, w, _ = batch.shape
        out = []
        for rh, rw, ph, pw in scale_plan(h, w, self.config):
            if (rh, rw) != (h, w):
                x = np.asarray(jax.device_get(
                    resize_batch(batch, rh, rw, method="linear")),
                    np.float32)
            else:
                x = batch.astype(np.float32)
            x = x / 255.0 * 2.0 - 1.0
            padded = np.zeros((n, ph, pw, 3), np.float32)
            padded[:, :rh, :rw] = x
            out.append(jnp.asarray(padded))
        return out

    def score_batch(self, images):
        if not images:
            return []
        n = len(images)
        scores = np.zeros(n, np.float64)
        by_shape = {}
        for i, img in enumerate(images):
            by_shape.setdefault(img.shape[:2], []).append(i)
        for _, idxs in by_shape.items():
            batch = np.stack([images[i] for i in idxs])
            raw = np.asarray(jax.device_get(
                self._forward(self.params, self._pyramid(batch))))
            scores[idxs] = raw
        return [round(float(np.clip(r, 0.0, 100.0)) / 10.0, 2)
                for r in scores]
