"""Swin Transformer (v1) in flax — the RAM++ image encoder backbone.

The reference's RAM++ tagger loads ram_plus_swin_large_14m through the
recognize-anything library (reference: models/ram_tagger.py:20-38, 96-131),
whose image encoder is a stock Swin-L at 384 px (embed 192, depths
2/2/18/2, heads 6/12/24/48, window 12). This is a TPU-native
reimplementation of that architecture:

- every window attends in ONE batched einsum over (batch x windows) — no
  per-window loops; window partition/merge are pure reshapes/transposes;
- shifted windows use jnp.roll (static shift) and a PRECOMPUTED additive
  mask constant (the cross-window pairs that roll makes adjacent), so the
  whole forward is a single static XLA program;
- the relative-position bias gather uses a static index matrix computed
  once at module build time.

Module/parameter names mirror the torch checkpoint layout
(patch_embed.proj, layers.{i}.blocks.{j}.{norm1,attn,norm2,mlp},
downsample.{reduction,norm}, final norm) so the converter is a direct
rename (convert.py:convert_swin).
"""

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def relative_position_index(window: int) -> np.ndarray:
    """(window^2, window^2) indices into the (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))          # (2, w, w)
    flat = coords.reshape(2, -1)                            # (2, w*w)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, w*w, w*w)
    rel = rel.transpose(1, 2, 0) + (window - 1)             # to [0, 2w-2]
    return (rel[:, :, 0] * (2 * window - 1) + rel[:, :, 1]).astype(np.int32)


def shift_attention_mask(resolution: int, window: int, shift: int) -> np.ndarray:
    """(num_windows, w^2, w^2) additive mask for shifted-window attention.

    After jnp.roll, border windows contain pixels that were not neighbours;
    pairs from different pre-roll regions get -100 (the torch
    implementation's value) so softmax zeroes them.
    """
    img = np.zeros((resolution, resolution), np.int32)
    region = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = region
            region += 1
    n = resolution // window
    wins = img.reshape(n, window, n, window).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, window * window)                # (nW, w^2)
    diff = wins[:, :, None] != wins[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (B*nW, w^2, C); mask: (nW, w^2, w^2) additive or None."""
        n, c = x.shape[1], self.dim
        head_dim = c // self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(x.shape[0], n, 3, self.heads, head_dim)
        q, k, v = (qkv[:, :, i] for i in range(3))
        q = q * (head_dim ** -0.5)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32)

        table = self.param(
            "relative_position_bias_table", nn.initializers.zeros,
            ((2 * self.window - 1) ** 2, self.heads), jnp.float32)
        index = relative_position_index(self.window)
        bias = table[index.reshape(-1)].reshape(n, n, self.heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, self.heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(-1, self.heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(x.shape[0], n, c).astype(self.dtype)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    resolution: int
    window: int
    shift: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H*W, C)."""
        b, L, c = x.shape
        r, w = self.resolution, self.window
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        x = x.reshape(b, r, r, c)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        # partition: (B, nH, w, nW, w, C) -> (B*nWins, w^2, C)
        n = r // w
        x = x.reshape(b, n, w, n, w, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b * n * n, w * w, c)
        mask = (jnp.asarray(shift_attention_mask(r, w, self.shift))
                if self.shift else None)
        x = WindowAttention(self.dim, self.heads, w, self.dtype,
                            name="attn")(x, mask)
        x = x.reshape(b, n, n, w, w, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, r, r, c)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x.reshape(b, L, c)

        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int                 # input channel count
    resolution: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, L, c = x.shape
        r = self.resolution
        x = x.reshape(b, r, r, c)
        # torch order: cat(x[0::2,0::2], x[1::2,0::2], x[0::2,1::2], x[1::2,1::2])
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(b, (r // 2) * (r // 2), 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


@dataclass(frozen=True)
class SwinConfig:
    image_size: int = 384
    patch_size: int = 4
    embed_dim: int = 192                                  # Swin-L
    depths: tuple = (2, 2, 18, 2)
    heads: tuple = (6, 12, 24, 48)
    window: int = 12

    @property
    def num_features(self):
        return self.embed_dim * 2 ** (len(self.depths) - 1)


class SwinTransformer(nn.Module):
    config: SwinConfig = field(default_factory=SwinConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) normalized -> (B, tokens, num_features)."""
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_proj")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(x)

        resolution = cfg.image_size // p
        dim = cfg.embed_dim
        for stage, (depth, heads) in enumerate(zip(cfg.depths, cfg.heads)):
            for blk in range(depth):
                # no shift when the whole resolution is one window
                shift = (cfg.window // 2
                         if blk % 2 == 1 and resolution > cfg.window else 0)
                x = SwinBlock(dim, heads, resolution, cfg.window, shift,
                              self.dtype, name=f"layers{stage}_block{blk}")(x)
            if stage < len(cfg.depths) - 1:
                x = PatchMerging(dim, resolution, self.dtype,
                                 name=f"layers{stage}_downsample")(x)
                resolution //= 2
                dim *= 2
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
