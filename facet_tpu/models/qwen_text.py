"""Qwen2.5-VL text decoder in flax with a KV-cache generate loop.

Exact transcription of transformers' Qwen2_5_VLTextModel (the language half
of the VLM tagger — reference consumes it through host transformers,
models/vlm_tagger.py:327-444), re-planned for XLA:

- GQA attention (28 q heads / 4 kv heads at 7B) with q/k/v biases, o_proj
  bias-free, f32 softmax like eager_attention_forward;
- multimodal 3D RoPE: position ids arrive as (3, B, T) temporal/height/
  width streams; the per-stream rotary tables are merged along the head
  dim by `mrope_section` before the layers (all layers share them);
- RMSNorm in f32, SwiGLU MLP;
- one functional KV cache (pytree of (B, max_len, kv_heads, head_dim)
  arrays) threaded through apply — prefill writes the whole prompt, the
  decode step writes one slot via dynamic_update_slice;
- greedy generation runs as ONE jitted program: prefill + lax.scan over
  max_new_tokens with static shapes (prompt length buckets), per-row EOS
  done-masking. Text positions continue at max(vision/text positions)+1
  per row (the mrope delta), exactly like get_rope_index.

Numeric parity vs a random-init torch Qwen2_5_VLTextModel and greedy-
generate parity vs transformers are tested in tests/test_qwen_text.py.
Production use: the hybrid tagger runs the vision tower (qwen_vision.py)
and this decoder on TPU once checkpoints are converted
(tools/convert_checkpoints.py convert_qwen --text).
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class QwenTextConfig:
    # Qwen2.5-VL-7B language model; tests override with tiny dims
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    mrope_section: tuple = (16, 24, 24)
    tie_word_embeddings: bool = False

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads


def mrope_cos_sin(position_ids, config, dtype=jnp.float32):
    """(3, B, T) int positions -> (B, T, head_dim) cos/sin with the three
    temporal/height/width streams merged by mrope_section (x2 halves),
    matching Qwen2_5_VLRotaryEmbedding + apply_multimodal_rotary_pos_emb's
    section interleave. f32 tables like the upstream forced-float32 path."""
    head_dim = config.head_dim
    inv_freq = 1.0 / (config.rope_theta ** (
        np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    freqs = position_ids[..., None].astype(jnp.float32) * jnp.asarray(
        inv_freq, jnp.float32)                       # (3, B, T, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)   # (3, B, T, hd)
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    sections = list(config.mrope_section) * 2
    starts = np.cumsum([0] + sections[:-1])
    cos = jnp.concatenate(
        [cos[i % 3, :, :, s:s + w] for i, (s, w) in
         enumerate(zip(starts, sections))], axis=-1)
    sin = jnp.concatenate(
        [sin[i % 3, :, :, s:s + w] for i, (s, w) in
         enumerate(zip(starts, sections))], axis=-1)
    return cos.astype(dtype), sin.astype(dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x.astype(jnp.float32)
                * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class TextAttention(nn.Module):
    config: QwenTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, mask, cache=None, cache_index=None):
        """x: (B, T, E); cos/sin: (B, T, hd); mask: (B, T, S) bool of
        attendable positions (S = T without cache, max_len with).
        cache: None or {'k','v'}: (B, max_len, KV, hd). Returns
        (out, new_cache)."""
        cfg = self.config
        hd = cfg.head_dim
        b, t, _ = x.shape
        dense = lambda feats, bias, name: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, name=name)
        q = dense(cfg.num_heads * hd, True, "q_proj")(x)
        k = dense(cfg.num_kv_heads * hd, True, "k_proj")(x)
        v = dense(cfg.num_kv_heads * hd, True, "v_proj")(x)
        q = q.reshape(b, t, cfg.num_heads, hd)
        k = k.reshape(b, t, cfg.num_kv_heads, hd)
        v = v.reshape(b, t, cfg.num_kv_heads, hd)

        # rope in f32 (upstream autocasts to float32 around this)
        cq, sq = cos[:, :, None, :], sin[:, :, None, :]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cq + _rotate_half(qf) * sq).astype(self.dtype)
        k = (kf * cq + _rotate_half(kf) * sq).astype(self.dtype)

        if cache is not None:
            zero = jnp.zeros((), jnp.int32)
            new_k = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype),
                (zero, cache_index, zero, zero))
            new_v = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype),
                (zero, cache_index, zero, zero))
            cache = {"k": new_k, "v": new_v}
            k_all, v_all = new_k, new_v
        else:
            k_all, v_all = k, v

        # GQA: group query heads per kv head
        groups = cfg.num_heads // cfg.num_kv_heads
        qg = q.reshape(b, t, cfg.num_kv_heads, groups, hd)
        scores = jnp.einsum("btkgd,bskd->bkgts", qg, k_all) * (hd ** -0.5)
        scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
        weights = jax.nn.softmax(
            scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bkgts,bskd->btkgd", weights, v_all)
        out = out.reshape(b, t, cfg.num_heads * hd)
        return dense(cfg.hidden_size, False, "o_proj")(out), cache


class DecoderLayer(nn.Module):
    config: QwenTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, mask, cache=None, cache_index=None):
        cfg = self.config
        y = RMSNorm(cfg.rms_norm_eps, name="input_layernorm")(x)
        attn, cache = TextAttention(cfg, self.dtype, name="self_attn")(
            y, cos, sin, mask, cache, cache_index)
        x = x + attn
        y = RMSNorm(cfg.rms_norm_eps, name="post_attention_layernorm")(x)
        gate = nn.Dense(cfg.intermediate_size, use_bias=False,
                        dtype=self.dtype, name="gate_proj")(y)
        up = nn.Dense(cfg.intermediate_size, use_bias=False,
                      dtype=self.dtype, name="up_proj")(y)
        x = x + nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                         name="down_proj")(jax.nn.silu(gate) * up)
        return x, cache


class QwenTextModel(nn.Module):
    """Decoder stack: embeddings/inputs_embeds -> logits (+ updated cache)."""

    config: QwenTextConfig = QwenTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeds, position_ids, mask, cache=None,
                 cache_index=None):
        """embeds: (B, T, E) hidden inputs (token embeddings and/or vision
        embeddings already substituted); position_ids: (3, B, T);
        mask: (B, T, S) attendable positions; cache: None or per-layer list.
        -> (logits (B, T, vocab), new_cache)."""
        cfg = self.config
        cos, sin = mrope_cos_sin(position_ids, cfg, self.dtype)
        x = embeds.astype(self.dtype)
        new_cache = []
        for i in range(cfg.num_layers):
            layer_cache = None if cache is None else cache[i]
            x, layer_cache = DecoderLayer(cfg, self.dtype,
                                          name=f"layer{i}")(
                x, cos, sin, mask, layer_cache, cache_index)
            new_cache.append(layer_cache)
        x = RMSNorm(cfg.rms_norm_eps, name="norm")(x)
        if cfg.tie_word_embeddings:
            embed = self.variables["params"]["embed_tokens"]["embedding"]
            logits = x @ embed.T.astype(self.dtype)
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False,
                              dtype=self.dtype, name="lm_head")(x)
        return logits.astype(jnp.float32), (None if cache is None
                                            else new_cache)


def embed_tokens(params, token_ids):
    table = params["params"]["embed_tokens"]["embedding"]
    return jnp.take(table, token_ids, axis=0)


def init_text_params(config, seed=0):
    """Deterministic random init including the embedding table."""
    from facet_tpu.models.checkpoints import fallback_init, sds

    model = QwenTextModel(config)
    params = fallback_init(
        model, sds((1, 4, config.hidden_size)), sds((3, 1, 4), jnp.int32),
        sds((1, 4, 4), bool), seed=seed)
    rng = jax.random.PRNGKey(seed + 1)
    table = jax.random.normal(
        rng, (config.vocab_size, config.hidden_size), jnp.float32) * 0.02
    params = {"params": {**params["params"],
                         "embed_tokens": {"embedding": table}}}
    return model, params


class QwenTextDecoder:
    """Greedy KV-cache generation as one jitted program per shape bucket.

    generate() takes prompt embeddings (vision embeds already merged in by
    the tagger), a validity mask (left- or right-padded), (3, B, T)
    position ids and the per-row mrope delta start for new text positions.
    """

    def __init__(self, params, config=QwenTextConfig(), dtype=jnp.float32,
                 max_new_tokens=96, mesh=None):
        """mesh: optional ('dp', 'tp') jax.sharding.Mesh. With tp > 1 the
        decoder weights shard Megatron-style over 'tp' (parallel/tp.py) so
        the 7B model fits 16 GB v5e chips; batches shard over 'dp' when
        divisible. XLA's SPMD partitioner inserts the collectives."""
        self.config = config
        self.model = QwenTextModel(config, dtype)
        self.mesh = mesh
        if mesh is not None and mesh.shape.get("tp", 1) > 1:
            from facet_tpu.parallel.tp import (
                shard_qwen_text_params, validate_tp)

            validate_tp(config, mesh.shape["tp"])
            params = shard_qwen_text_params(params, mesh)
        self.params = params
        self.max_new_tokens = max_new_tokens
        self._programs = {}

    def _program(self, prompt_len, batch):
        key = (prompt_len, batch)
        if key in self._programs:
            return self._programs[key]
        cfg = self.config
        total = prompt_len + self.max_new_tokens
        model = self.model
        constrain_cache = None
        if self.mesh is not None and self.mesh.shape.get("tp", 1) > 1:
            from facet_tpu.parallel.tp import kv_cache_constraint

            constrain_cache = kv_cache_constraint(
                self.mesh, dp=batch % self.mesh.shape["dp"] == 0)

        def run(params, embeds, valid, position_ids, next_pos, eos_ids):
            """embeds (B,T,E); valid (B,T) bool; position_ids (3,B,T);
            next_pos (B,) first position id for generated tokens;
            eos_ids (n_eos,) -> (B, max_new) int32 tokens (eos-filled)."""
            b = embeds.shape[0]
            kv = cfg.num_kv_heads
            hd = cfg.head_dim
            cache = [{"k": jnp.zeros((b, total, kv, hd), embeds.dtype),
                      "v": jnp.zeros((b, total, kv, hd), embeds.dtype)}
                     for _ in range(cfg.num_layers)]
            if constrain_cache is not None:
                cache = [constrain_cache(c) for c in cache]
            slot_valid = jnp.concatenate(
                [valid, jnp.zeros((b, self.max_new_tokens), bool)], axis=1)

            # prefill: causal within the prompt, padding masked out
            causal = jnp.tril(jnp.ones((prompt_len, prompt_len), bool))
            pmask = causal[None] & valid[:, None, :]
            pmask = jnp.pad(
                pmask, ((0, 0), (0, 0), (0, self.max_new_tokens)))
            logits, cache = model.apply(params, embeds, position_ids, pmask,
                                        cache, 0)
            # last valid slot holds the next-token logits (index-max form
            # works for right- AND left-padded rows)
            last = jnp.max(jnp.where(valid, jnp.arange(prompt_len)[None, :],
                                     -1), axis=1)
            last = jnp.maximum(last, 0)
            next_logits = logits[jnp.arange(b), last]

            def step(carry, i):
                cache, slot_valid, tok, done, pos = carry
                emb = embed_tokens(params, tok)[:, None, :]
                pos3 = jnp.broadcast_to(pos[None, :, None], (3, b, 1))
                slot_valid = slot_valid.at[:, prompt_len + i].set(~done)
                # the new slot must attend to itself even when done
                mask = slot_valid.at[:, prompt_len + i].set(True)[:, None, :]
                logits, cache = model.apply(
                    params, emb, pos3, mask, cache, prompt_len + i)
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                is_eos = jnp.any(nxt[:, None] == eos_ids[None, :], axis=1)
                out = jnp.where(done, eos_ids[0], nxt)
                done = done | is_eos
                return (cache, slot_valid, out, done, pos + 1), out

            tok0 = jnp.argmax(next_logits, axis=-1).astype(jnp.int32)
            done0 = jnp.any(tok0[:, None] == eos_ids[None, :], axis=1)
            # tok0 sits at position next_pos; step i embeds the token from
            # step i-1, so the carry position starts at tok0's own slot
            carry = (cache, slot_valid, tok0, done0, next_pos)
            # emit the first token, then scan the rest
            (_, _, _, _, _), rest = jax.lax.scan(
                step, carry, jnp.arange(self.max_new_tokens - 1))
            return jnp.concatenate([tok0[:, None], rest.T], axis=1)

        self._programs[key] = jax.jit(run)
        return self._programs[key]

    def generate(self, embeds, valid, position_ids, next_pos, eos_ids):
        """numpy in -> (B, max_new_tokens) numpy token ids; rows are valid
        up to (and excluding) the first eos."""
        b, t, _ = embeds.shape
        run = self._program(t, b)
        args = (jnp.asarray(embeds), jnp.asarray(valid, bool),
                jnp.asarray(position_ids), jnp.asarray(next_pos, jnp.int32),
                jnp.asarray(eos_ids, jnp.int32))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = self.mesh.shape.get("dp", 1)
            bdim = ("dp",) if b % dp == 0 else (None,)
            # position_ids carry batch on axis 1; eos_ids have no batch axis
            specs = (P(*bdim, None, None), P(*bdim, None),
                     P(None, *bdim, None), P(*bdim), P(None))
            args = tuple(jax.device_put(a, NamedSharding(self.mesh, s))
                         for a, s in zip(args, specs))
        out = run(self.params, *args)
        return np.asarray(jax.device_get(out))


def text_rope_index(input_ids, image_spans, config_merge=2):
    """Host-side 3D rope positions for image+text rows (get_rope_index).

    input_ids: (B, T) with padding anywhere (marked by valid); image_spans:
    per row, list of (start, t, h, w) — start index of the first image pad
    token, grid dims BEFORE spatial merge. Text tokens advance all three
    streams together, continuing from max(previous)+1; image tokens get
    constant t and raster h/w positions offset by the text cursor.

    Returns position_ids (3, B, T) and next_pos (B,) — the first position
    for generated tokens (max + 1), matching mrope_position_deltas use.
    """
    ids = np.asarray(input_ids)
    b, t = ids.shape
    pos = np.zeros((3, b, t), np.int64)
    next_pos = np.zeros(b, np.int64)
    for i in range(b):
        spans = sorted(image_spans[i]) if image_spans else []
        cursor = 0          # next sequential position value
        idx = 0             # next token index to fill
        for start, gt, gh, gw in spans:
            n_text = start - idx
            if n_text > 0:
                pos[:, i, idx:start] = cursor + np.arange(n_text)
                cursor += n_text
                idx = start
            lh, lw = gh // config_merge, gw // config_merge
            n_img = int(gt) * lh * lw
            tpos = np.repeat(np.arange(int(gt)), lh * lw)
            hpos = np.tile(np.repeat(np.arange(lh), lw), int(gt))
            wpos = np.tile(np.tile(np.arange(lw), lh), int(gt))
            pos[0, i, idx:idx + n_img] = cursor + tpos
            pos[1, i, idx:idx + n_img] = cursor + hpos
            pos[2, i, idx:idx + n_img] = cursor + wpos
            cursor += max(int(gt), lh, lw)
            idx += n_img
        if idx < t:
            pos[:, i, idx:] = cursor + np.arange(t - idx)
            cursor += t - idx
        next_pos[i] = cursor
    return pos, next_pos


def rope_index_batch(input_ids, valid, image_grid_thw, image_token_id,
                     merge=2):
    """3D rope positions for a padded batch (left- or right-padded).

    Per row: strip pad slots, detect contiguous image-token runs (consuming
    grids from image_grid_thw in order across the whole batch, like the
    processor emits them), compute positions with text_rope_index on the
    stripped sequence and scatter them back to the valid slots. Pad slots
    keep position 1 (masked out of attention anyway), matching
    get_rope_index's ones-init.
    """
    ids = np.asarray(input_ids)
    valid = np.asarray(valid, bool)
    b, t = ids.shape
    pos = np.ones((3, b, t), np.int64)
    next_pos = np.zeros(b, np.int64)
    img_i = 0
    for i in range(b):
        vi = np.nonzero(valid[i])[0]
        sub = ids[i, vi]
        spans = []
        j = 0
        while j < len(sub):
            if sub[j] == image_token_id:
                gt, gh, gw = (int(x) for x in image_grid_thw[img_i])
                img_i += 1
                spans.append((j, gt, gh, gw))
                j += gt * (gh // merge) * (gw // merge)
            else:
                j += 1
        sub_pos, sub_next = text_rope_index(sub[None], [spans], merge)
        pos[:, i, vi] = sub_pos[:, 0]
        next_pos[i] = sub_next[0]
    return pos, next_pos


def convert_qwen_text(state_dict, config=None):
    """HF Qwen2.5-VL state dict -> QwenTextModel param tree.

    Accepts the full-model key layout ('model.language_model.layers.*' in
    transformers>=4.52, 'model.layers.*' before) and bare text-model dumps
    ('layers.*'). Key map verified against a random-init torch instance in
    tests/test_qwen_text.py:
      ...embed_tokens.weight                       embed_tokens/embedding
      ...layers.{i}.input_layernorm.weight         layer{i}/input_layernorm
      ...layers.{i}.self_attn.q|k|v_proj.*         layer{i}/self_attn/...
      ...layers.{i}.self_attn.o_proj.weight        layer{i}/self_attn/o_proj
      ...layers.{i}.post_attention_layernorm.*     layer{i}/...
      ...layers.{i}.mlp.gate|up|down_proj.weight   layer{i}/...
      ...norm.weight                               norm/scale
      lm_head.weight (untied only)                 lm_head/kernel
    """
    config = config or QwenTextConfig()
    sd = {}
    for k, v in state_dict.items():
        for prefix in ("model.language_model.", "model.", "language_model.",
                       ""):
            if k.startswith(prefix) and (
                    k[len(prefix):].startswith(("layers.", "embed_tokens.",
                                                "norm."))):
                sd[k[len(prefix):]] = np.asarray(v)
                break
        if k in ("lm_head.weight",):
            sd[k] = np.asarray(v)

    f32 = lambda a: a.astype(np.float32)
    lin = lambda p, bias: (
        {"kernel": f32(sd[p + ".weight"]).T, "bias": f32(sd[p + ".bias"])}
        if bias else {"kernel": f32(sd[p + ".weight"]).T})
    params = {"embed_tokens": {"embedding": f32(sd["embed_tokens.weight"])},
              "norm": {"scale": f32(sd["norm.weight"])}}
    for i in range(config.num_layers):
        L = f"layers.{i}"
        params[f"layer{i}"] = {
            "input_layernorm": {
                "scale": f32(sd[f"{L}.input_layernorm.weight"])},
            "post_attention_layernorm": {
                "scale": f32(sd[f"{L}.post_attention_layernorm.weight"])},
            "self_attn": {
                "q_proj": lin(f"{L}.self_attn.q_proj", True),
                "k_proj": lin(f"{L}.self_attn.k_proj", True),
                "v_proj": lin(f"{L}.self_attn.v_proj", True),
                "o_proj": lin(f"{L}.self_attn.o_proj", False),
            },
            "gate_proj": lin(f"{L}.mlp.gate_proj", False),
            "up_proj": lin(f"{L}.mlp.up_proj", False),
            "down_proj": lin(f"{L}.mlp.down_proj", False),
        }
    if not config.tie_word_embeddings:
        params["lm_head"] = {"kernel": f32(sd["lm_head.weight"]).T}
    return {"params": params}
