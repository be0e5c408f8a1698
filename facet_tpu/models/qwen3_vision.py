"""Qwen3-VL vision tower in flax: the qwen3_vl_tagger's TPU path.

Exact transcription of transformers' Qwen3VLVisionModel
(modeling_qwen3_vl.py, installed locally), re-planned for XLA's static
shapes: one jitted program per (grid_h, grid_w). Unlike Qwen2.5's tower
there is no window attention — every block attends over the whole image —
so the only static precomputation is the learned-position bilinear
interpolation and the 2D rotary tables:

- patch embed: the stride=kernel Conv3d is one matmul (+bias) over
  flattened (C * T * P * P) patch vectors;
- learned absolute positions: a 48x48 grid bilinearly resampled to the
  image grid (fast_pos_embed_interpolate) — the 4 gather indices and
  weights depend only on the grid, baked into the program as constants;
- 2D rotary embeddings in f32, tokens in the spatial-merge cell-major
  order the processor emits (same layout as Qwen2.5);
- deepstack: blocks [8, 16, 24] also emit features through their own
  post-shuffle-norm patch mergers; the main merger (pre-shuffle norm)
  produces the embeddings that replace image pad tokens, and the
  deepstack features are ADDED to the first decoder layers' hidden
  states (models/qwen3_text.py).

Numeric parity vs a torch instance is tested in tests/test_qwen3_vl.py.
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.models.qwen_vision import _apply_rope, rotary_tables


@dataclass(frozen=True)
class Qwen3VisionConfig:
    # Qwen3-VL defaults (2B tower); tests override with tiny dims
    hidden_size: int = 1152
    out_hidden_size: int = 3584
    intermediate_size: int = 4304
    num_heads: int = 16
    depth: int = 27
    in_channels: int = 3
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    num_position_embeddings: int = 2304       # 48 x 48 learned grid
    deepstack_visual_indexes: tuple = (8, 16, 24)

    @property
    def patch_dim(self):
        return (self.in_channels * self.temporal_patch_size
                * self.patch_size ** 2)

    @property
    def grid_side(self):
        return int(self.num_position_embeddings ** 0.5)


def pos_embed_plan(config, grid_h, grid_w):
    """Static bilinear resampling plan for the learned position grid
    (fast_pos_embed_interpolate): 4 index arrays + 4 weight arrays over the
    flattened 48x48 table, in RASTER order, then permuted to the
    spatial-merge cell-major token order."""
    side = config.grid_side
    m = config.spatial_merge_size
    h_idxs = np.linspace(0, side - 1, grid_h)
    w_idxs = np.linspace(0, side - 1, grid_w)
    h_floor = h_idxs.astype(np.int64)
    w_floor = w_idxs.astype(np.int64)
    h_ceil = np.clip(h_floor + 1, None, side - 1)
    w_ceil = np.clip(w_floor + 1, None, side - 1)
    dh = h_idxs - h_floor
    dw = w_idxs - w_floor

    idx = [
        (h_floor[:, None] * side + w_floor[None, :]).reshape(-1),
        (h_floor[:, None] * side + w_ceil[None, :]).reshape(-1),
        (h_ceil[:, None] * side + w_floor[None, :]).reshape(-1),
        (h_ceil[:, None] * side + w_ceil[None, :]).reshape(-1),
    ]
    weight = [
        ((1 - dh)[:, None] * (1 - dw)[None, :]).reshape(-1),
        ((1 - dh)[:, None] * dw[None, :]).reshape(-1),
        (dh[:, None] * (1 - dw)[None, :]).reshape(-1),
        (dh[:, None] * dw[None, :]).reshape(-1),
    ]
    # raster -> cell-major permutation (t=1 for stills)
    order = np.arange(grid_h * grid_w).reshape(
        grid_h // m, m, grid_w // m, m).transpose(0, 2, 1, 3).reshape(-1)
    return ([np.asarray(i)[order] for i in idx],
            [np.asarray(w)[order].astype(np.float32) for w in weight])


class PatchMerger(nn.Module):
    """LayerNorm -> concat merge-unit cells -> fc1 -> exact GELU -> fc2.
    postshuffle=True norms AFTER the cell concat (deepstack mergers)."""

    config: Qwen3VisionConfig
    postshuffle: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        unit = cfg.spatial_merge_size ** 2
        wide = unit * cfg.hidden_size
        if self.postshuffle:
            y = x.reshape(-1, wide)
            y = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
        else:
            y = nn.LayerNorm(epsilon=1e-6, name="norm")(x).reshape(-1, wide)
        y = nn.Dense(wide, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Dense(cfg.out_hidden_size, name="fc2")(y)


class Qwen3VisionBlock(nn.Module):
    config: Qwen3VisionConfig

    @nn.compact
    def __call__(self, x, cos, sin):
        """x: (seq, dim); full attention over the image."""
        cfg = self.config
        heads = cfg.num_heads
        head_dim = cfg.hidden_size // heads
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * cfg.hidden_size, name="qkv")(y)
        seq = x.shape[0]
        qkv = qkv.reshape(seq, 3, heads, head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q, k = _apply_rope(q, k, cos, sin)
        scores = jnp.einsum("qhd,khd->hqk", q, k) / np.sqrt(head_dim)
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("hqk,khd->qhd", weights, v).reshape(
            seq, cfg.hidden_size)
        x = x + nn.Dense(cfg.hidden_size, name="proj")(out)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(cfg.intermediate_size, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=True)      # gelu_pytorch_tanh
        return x + nn.Dense(cfg.hidden_size, name="fc2")(y)


class Qwen3VisionTower(nn.Module):
    """One image per call; grid dims static (one program per shape)."""

    config: Qwen3VisionConfig
    grid_h: int
    grid_w: int

    @nn.compact
    def __call__(self, patches):
        """patches: (seq, patch_dim) f32 in cell-major order (the HF
        processor layout). -> (cells, out_hidden) main embeddings +
        [(cells, out_hidden)] deepstack features, cell raster order."""
        cfg = self.config
        idx, weight = pos_embed_plan(cfg, self.grid_h, self.grid_w)
        cos_np, sin_np = rotary_tables(
            _RotaryShim(cfg), self.grid_h, self.grid_w)

        x = nn.Dense(cfg.hidden_size, use_bias=True,
                     name="patch_embed")(patches)
        table = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (cfg.num_position_embeddings, cfg.hidden_size))
        pos = sum(jnp.take(table, jnp.asarray(i), axis=0)
                  * jnp.asarray(w)[:, None]
                  for i, w in zip(idx, weight))
        x = x + pos

        cos = jnp.asarray(cos_np)
        sin = jnp.asarray(sin_np)
        deepstack = []
        for i in range(cfg.depth):
            x = Qwen3VisionBlock(cfg, name=f"block{i}")(x, cos, sin)
            if i in cfg.deepstack_visual_indexes:
                k = cfg.deepstack_visual_indexes.index(i)
                deepstack.append(PatchMerger(
                    cfg, postshuffle=True, name=f"deepstack{k}")(x))
        main = PatchMerger(cfg, postshuffle=False, name="merger")(x)
        return main, deepstack


class _RotaryShim:
    """rotary_tables() reads hidden_size/num_heads/spatial_merge_size; the
    Qwen3 rotary math is identical to Qwen2.5's (head_dim//2 table, h/w
    halves duplicated)."""

    def __init__(self, cfg):
        self.hidden_size = cfg.hidden_size
        self.num_heads = cfg.num_heads
        self.spatial_merge_size = cfg.spatial_merge_size


class Qwen3VisionEncoder:
    """Engine wrapper: encode HF-processor patch tensors on device."""

    def __init__(self, params, config=None):
        self.params = params
        self.config = config or Qwen3VisionConfig()
        self._programs = {}

    @classmethod
    def load(cls, path=None, config=None):
        import os

        from facet_tpu.models.convert import load_params

        from facet_tpu.models.checkpoints import PRETRAINED_DIR

        path = path or os.path.join(PRETRAINED_DIR, "qwen3_vision.npz")
        if not os.path.exists(path):
            return None
        return cls(load_params(path), config)

    def encode(self, patches, grid_thw):
        """patches (total_seq, patch_dim); grid_thw [(t, h, w)] ->
        (total_cells, out_hidden) main embeds, [(total_cells, out_hidden)]
        deepstack feature list (image order preserved)."""
        outs, deeps, offset = [], None, 0
        for t, h, w in grid_thw:
            if int(t) != 1:
                raise NotImplementedError(
                    "Qwen3VisionEncoder handles stills (t=1); the tagger "
                    "never sends video grids")
            seq = int(t) * int(h) * int(w)
            key = (int(h), int(w))
            if key not in self._programs:
                tower = Qwen3VisionTower(self.config, key[0], key[1])
                self._programs[key] = jax.jit(tower.apply)
            main, ds = self._programs[key](
                self.params, jnp.asarray(patches[offset:offset + seq],
                                         jnp.float32))
            outs.append(np.asarray(jax.device_get(main)))
            ds = [np.asarray(jax.device_get(d)) for d in ds]
            if deeps is None:
                deeps = [[d] for d in ds]
            else:
                for acc, d in zip(deeps, ds):
                    acc.append(d)
            offset += seq
        return (np.concatenate(outs, axis=0),
                [np.concatenate(acc, axis=0) for acc in (deeps or [])])


def convert_qwen3_vision(state_dict, config=None):
    """HF Qwen3-VL state dict -> Qwen3VisionTower param tree.

    Accepts model.visual.* / visual.* / bare keys. Key map verified against
    a random-init torch instance in tests/test_qwen3_vl.py:
      visual.patch_embed.proj.weight|bias      patch_embed (flattened)
      visual.pos_embed.weight                  pos_embed
      visual.blocks.{i}.norm1|norm2.*          block{i}/norm1|norm2
      visual.blocks.{i}.attn.qkv|proj.*        block{i}/qkv|proj
      visual.blocks.{i}.mlp.linear_fc1|fc2.*   block{i}/fc1|fc2
      visual.merger.{norm,linear_fc1,linear_fc2}.*       merger/*
      visual.deepstack_merger_list.{k}.*                 deepstack{k}/*
    """
    config = config or Qwen3VisionConfig()
    for pfx in ("model.visual.", "visual.", ""):
        sd = {k[len(pfx):]: np.asarray(v) for k, v in state_dict.items()
              if k.startswith(pfx)} if pfx else {
                  k: np.asarray(v) for k, v in state_dict.items()}
        if "patch_embed.proj.weight" in sd:
            break

    f32 = lambda a: a.astype(np.float32)
    dense = lambda p: {"kernel": f32(sd[p + ".weight"]).T,
                       "bias": f32(sd[p + ".bias"])}
    ln = lambda p: {"scale": f32(sd[p + ".weight"]),
                    "bias": f32(sd[p + ".bias"])}

    pw = f32(sd["patch_embed.proj.weight"])       # (E, C, T, P, P)
    params = {
        "patch_embed": {
            "kernel": pw.reshape(pw.shape[0], -1).T,
            "bias": f32(sd["patch_embed.proj.bias"]),
        },
        "pos_embed": f32(sd["pos_embed.weight"]),
    }
    for i in range(config.depth):
        B = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": ln(f"{B}.norm1"),
            "norm2": ln(f"{B}.norm2"),
            "qkv": dense(f"{B}.attn.qkv"),
            "proj": dense(f"{B}.attn.proj"),
            "fc1": dense(f"{B}.mlp.linear_fc1"),
            "fc2": dense(f"{B}.mlp.linear_fc2"),
        }

    def merger(src):
        return {"norm": ln(f"{src}.norm"),
                "fc1": dense(f"{src}.linear_fc1"),
                "fc2": dense(f"{src}.linear_fc2")}

    params["merger"] = merger("merger")
    for k in range(len(config.deepstack_visual_indexes)):
        params[f"deepstack{k}"] = merger(f"deepstack_merger_list.{k}")
    return {"params": params}
