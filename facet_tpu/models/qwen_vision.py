"""Qwen2.5-VL vision tower in flax: the VLM tagger's TPU path.

Exact transcription of transformers' Qwen2_5_VisionTransformerPretrainedModel
(modeling_qwen2_5_vl.py, installed locally), re-planned for XLA's static
shapes: one jitted program per (grid_h, grid_w). The window permutation,
rotary tables and attention grouping depend only on the grid, so they are
precomputed host-side as constants baked into the program:

- patch embed: the stride=kernel Conv3d is a single matmul over flattened
  (C * T * P * P) patch vectors;
- window attention: with the image padded to a window multiple (transformers
  pads the index grid the same way), every window holds the same number of
  tokens, so windowed blocks run as one batched (n_windows, win_tokens)
  attention — no variable-length cu_seqlens machinery;
- full-attention blocks ([7, 15, 23, 31]) run over the whole sequence;
- 2D rotary embeddings applied in f32 exactly as upstream;
- merger: RMSNorm -> concat 2x2 spatial cells -> MLP, then the inverse
  window permutation restores raster order.

Numeric parity vs a torch instance is tested in tests/test_qwen_vision.py.
Production use: encode image crops on TPU, hand the merged embeddings to the
host LLM via inputs_embeds (models/vlm_tagger.py).
"""

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class QwenVisionConfig:
    # Qwen2.5-VL-7B vision tower; tests override with tiny dims
    hidden_size: int = 1280
    out_hidden_size: int = 3584
    intermediate_size: int = 3420
    num_heads: int = 16
    depth: int = 32
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple = (7, 15, 23, 31)

    @property
    def patch_dim(self):
        return (self.in_channels * self.temporal_patch_size
                * self.patch_size ** 2)

    @property
    def merger_window(self):
        """Window edge in merged-cell units."""
        return self.window_size // self.spatial_merge_size // self.patch_size


def window_layout(config, grid_h, grid_w):
    """Static window bookkeeping for one (grid_h, grid_w) patch grid.

    Mirrors get_window_index + the spatial_merge_unit grouping in
    modeling_qwen2_5_vl.py, with the grid padded UP to a whole number of
    windows so every window has identical token count (pad cells carry an
    attention mask instead of being dropped).

    Returns dict with:
      perm        (padded_cells,) source cell index per window-ordered slot
                  (-1 for pad cells)
      inverse     (real_cells,) window-ordered slot per raster cell
      valid       (padded_cells,) bool, False on pad slots
      n_windows, cells_per_window
    """
    m = config.spatial_merge_size
    lh, lw = grid_h // m, grid_w // m          # merged-cell grid
    win = config.merger_window
    pad_h = (-lh) % win
    pad_w = (-lw) % win
    nwh, nww = (lh + pad_h) // win, (lw + pad_w) // win

    index = np.full(((lh + pad_h), (lw + pad_w)), -1, np.int64)
    index[:lh, :lw] = np.arange(lh * lw).reshape(lh, lw)
    index = index.reshape(nwh, win, nww, win).transpose(0, 2, 1, 3)
    perm = index.reshape(-1)
    valid = perm >= 0
    inverse = np.empty(lh * lw, np.int64)
    inverse[perm[valid]] = np.nonzero(valid)[0]
    return {
        "perm": perm, "valid": valid, "inverse": inverse,
        "n_windows": nwh * nww, "cells_per_window": win * win,
    }


def rotary_tables(config, grid_h, grid_w):
    """(seq, head_dim) cos/sin tables in RASTER patch order (rot_pos_emb +
    the duplicated cat in the upstream forward), before window permutation."""
    m = config.spatial_merge_size
    head_dim = config.hidden_size // config.num_heads
    dim = head_dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))

    hpos = np.arange(grid_h)[:, None].repeat(grid_w, 1)
    wpos = np.arange(grid_w)[None, :].repeat(grid_h, 0)
    # cell-major ordering: (h/m, w/m, m, m), matching spatial_merge_unit rows
    order = lambda a: a.reshape(grid_h // m, m, grid_w // m, m) \
        .transpose(0, 2, 1, 3).reshape(-1)
    hpos, wpos = order(hpos), order(wpos)
    freqs_h = hpos[:, None] * inv_freq[None, :]
    freqs_w = wpos[:, None] * inv_freq[None, :]
    emb = np.concatenate([freqs_h, freqs_w], axis=1)
    emb = np.concatenate([emb, emb], axis=1)   # duplicated halves
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rope(q, k, cos, sin):
    """q/k: (..., seq, heads, head_dim); cos/sin: (seq, head_dim). f32 math
    like apply_rotary_pos_emb_vision."""
    dtype = q.dtype
    q, k = q.astype(jnp.float32), k.astype(jnp.float32)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    q = q * c + _rotate_half(q) * s
    k = k * c + _rotate_half(k) * s
    return q.astype(dtype), k.astype(dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class VisionAttention(nn.Module):
    config: QwenVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask=None):
        """x: (groups, tokens, dim); cos/sin: (groups, tokens, head_dim);
        mask: (groups, tokens) validity or None."""
        cfg = self.config
        heads = cfg.num_heads
        head_dim = cfg.hidden_size // heads
        g, t, _ = x.shape
        qkv = nn.Dense(3 * cfg.hidden_size, name="qkv")(x)
        qkv = qkv.reshape(g, t, 3, heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k = _apply_rope(q, k, cos, sin)
        scores = jnp.einsum("gqhd,gkhd->ghqk", q, k) / np.sqrt(head_dim)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e30)
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("ghqk,gkhd->gqhd", weights, v)
        out = out.reshape(g, t, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, name="proj")(out)


class VisionBlock(nn.Module):
    config: QwenVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask=None):
        cfg = self.config
        y = RMSNorm(name="norm1")(x)
        x = x + VisionAttention(cfg, name="attn")(y, cos, sin, mask)
        y = RMSNorm(name="norm2")(x)
        gate = nn.Dense(cfg.intermediate_size, name="gate_proj")(y)
        up = nn.Dense(cfg.intermediate_size, name="up_proj")(y)
        x = x + nn.Dense(cfg.hidden_size, name="down_proj")(
            jax.nn.silu(gate) * up)
        return x


class QwenVisionTower(nn.Module):
    """One image per call; grid dims are static (one program per shape)."""

    config: QwenVisionConfig
    grid_h: int
    grid_w: int

    @nn.compact
    def __call__(self, patches):
        """patches: (seq, patch_dim) f32, seq = grid_h * grid_w, rows in the
        spatial_merge_unit cell-major order transformers' processor emits.
        -> (seq / merge^2, out_hidden_size) merged embeddings, raster order.
        """
        cfg = self.config
        layout = window_layout(cfg, self.grid_h, self.grid_w)
        cos_np, sin_np = rotary_tables(cfg, self.grid_h, self.grid_w)
        unit = cfg.spatial_merge_size ** 2
        seq = self.grid_h * self.grid_w
        cells = seq // unit
        padded_cells = layout["perm"].shape[0]
        cpw = layout["cells_per_window"]
        nwin = layout["n_windows"]

        x = nn.Dense(cfg.hidden_size, use_bias=False, name="patch_embed")(patches)

        # window permutation over merge cells (pad cells -> zeros + mask)
        gather = np.where(layout["perm"] >= 0, layout["perm"], 0)
        def permute(arr):
            grouped = arr.reshape(cells, unit, -1)
            out = jnp.take(grouped, jnp.asarray(gather), axis=0)
            out = out * jnp.asarray(layout["valid"], arr.dtype)[:, None, None]
            return out.reshape(padded_cells * unit, arr.shape[-1])

        x = permute(x)
        cos = permute(jnp.asarray(cos_np))
        sin = permute(jnp.asarray(sin_np))
        token_valid = jnp.asarray(
            np.repeat(layout["valid"], unit))

        win_shape = (nwin, cpw * unit, cfg.hidden_size)
        rope_shape = (nwin, cpw * unit, cos.shape[-1])
        for i in range(cfg.depth):
            if i in cfg.fullatt_block_indexes:
                x = VisionBlock(cfg, name=f"block{i}")(
                    x[None], cos[None], sin[None], token_valid[None])[0]
            else:
                x = VisionBlock(cfg, name=f"block{i}")(
                    x.reshape(win_shape), cos.reshape(rope_shape),
                    sin.reshape(rope_shape),
                    token_valid.reshape(nwin, cpw * unit)).reshape(
                        padded_cells * unit, cfg.hidden_size)

        # merger: RMSNorm, concat the spatial_merge_unit cells, MLP
        y = RMSNorm(name="ln_q")(x).reshape(padded_cells,
                                            unit * cfg.hidden_size)
        y = nn.Dense(unit * cfg.hidden_size, name="merger_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.out_hidden_size, name="merger_fc2")(y)

        # drop pad cells + invert the window permutation -> raster order
        return jnp.take(y, jnp.asarray(layout["inverse"]), axis=0)


class QwenVisionEncoder:
    """Engine wrapper: encode HF-processor patch tensors on the device.

    The HF processor already emits exactly the tower's input — flattened
    (seq, C*T*P*P) patch rows plus per-image (t, h, w) grids — so hybrid
    inference swaps the torch visual tower for this encoder and leaves the
    LLM, mrope and generation untouched (models/vlm_tagger.py)."""

    def __init__(self, params, config=None):
        self.params = params
        self.config = config or QwenVisionConfig()
        self._programs = {}

    @classmethod
    def load(cls, path=None, config=None):
        import os

        from facet_tpu.models.convert import load_params

        from facet_tpu.models.checkpoints import PRETRAINED_DIR

        path = path or os.path.join(PRETRAINED_DIR, "qwen25_vision.npz")
        if not os.path.exists(path):
            return None
        return cls(load_params(path), config)

    def encode(self, patches, grid_thw):
        """patches: (total_seq, patch_dim) float; grid_thw: [(t, h, w)].
        -> (total_merged_cells, out_hidden) float32, image order preserved."""
        outs, offset = [], 0
        for t, h, w in grid_thw:
            seq = int(t) * int(h) * int(w)
            key = (int(h), int(w))
            if key not in self._programs:
                tower = QwenVisionTower(self.config, key[0], key[1])
                self._programs[key] = jax.jit(tower.apply)
            out = self._programs[key](
                self.params, jnp.asarray(patches[offset:offset + seq],
                                         jnp.float32))
            outs.append(np.asarray(jax.device_get(out)))
            offset += seq
        return np.concatenate(outs, axis=0)


def convert_qwen_vision(state_dict, config=None, prefix="visual."):
    """HF Qwen2.5-VL state dict (visual.* keys) -> QwenVisionTower tree.

    Key map (verified by tests/test_qwen_vision.py against a random-init
    torch instance):
      visual.patch_embed.proj.weight          patch_embed/kernel (flattened)
      visual.blocks.{i}.norm1|norm2.weight    block{i}/norm1|norm2/scale
      visual.blocks.{i}.attn.qkv.*            block{i}/attn/qkv
      visual.blocks.{i}.attn.proj.*           block{i}/attn/proj
      visual.blocks.{i}.mlp.gate|up|down_proj block{i}/gate|up|down_proj
      visual.merger.ln_q.weight               ln_q/scale
      visual.merger.mlp.0|2.*                 merger_fc1|merger_fc2
    """
    # full-model dumps nest the tower under model.visual.* (transformers
    # >=4.52) or visual.*; vision-only dumps have no prefix
    for pfx in (f"model.{prefix}", prefix, ""):
        sd = {k[len(pfx):]: np.asarray(v) for k, v in state_dict.items()
              if k.startswith(pfx)} if pfx else {
                  k: np.asarray(v) for k, v in state_dict.items()}
        if "patch_embed.proj.weight" in sd:
            break

    dense = lambda p: {"kernel": sd[p + ".weight"].astype(np.float32).T,
                       "bias": sd[p + ".bias"].astype(np.float32)}
    params = {}
    pe = sd["patch_embed.proj.weight"].astype(np.float32)  # (E, C, T, P, P)
    params["patch_embed"] = {"kernel": pe.reshape(pe.shape[0], -1).T}
    depth = 0
    while f"blocks.{depth}.norm1.weight" in sd:
        depth += 1
    for i in range(depth):
        b = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": {"scale": sd[f"{b}.norm1.weight"].astype(np.float32)},
            "norm2": {"scale": sd[f"{b}.norm2.weight"].astype(np.float32)},
            "attn": {"qkv": dense(f"{b}.attn.qkv"),
                     "proj": dense(f"{b}.attn.proj")},
            "gate_proj": dense(f"{b}.mlp.gate_proj"),
            "up_proj": dense(f"{b}.mlp.up_proj"),
            "down_proj": dense(f"{b}.mlp.down_proj"),
        }
    params["ln_q"] = {"scale": sd["merger.ln_q.weight"].astype(np.float32)}
    params["merger_fc1"] = dense("merger.mlp.0")
    params["merger_fc2"] = dense("merger.mlp.2")
    return {"params": params}
