"""Qwen3-VL text decoder in flax with KV-cache greedy generation.

Exact transcription of transformers' Qwen3VLTextModel (the language half
of the qwen3_vl_tagger — reference drives it through host transformers,
models/vlm_tagger.py:370-444), re-planned for XLA like models/qwen_text.py.
Differences from the Qwen2.5 decoder:

- per-head RMSNorm on q and k (over head_dim, before rope), no qkv biases,
  explicit head_dim;
- INTERLEAVED multimodal RoPE: the three temporal/height/width frequency
  streams merge by interleaving ([THW THW ... TT] over frequency slots,
  apply_interleaved_mrope) instead of Qwen2.5's chunked sections;
- DeepStack: the vision tower's intermediate features are ADDED to the
  image-token positions of the first len(deepstack) decoder layers'
  hidden states during prefill (Qwen3VLTextModel._deepstack_process).

Host-side rope-index builders are shared with qwen_text (image handling is
identical; only video timestamps differ, which the tagger never uses).
Numeric + greedy-generate parity vs transformers: tests/test_qwen3_vl.py.
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.models.qwen_text import (
    RMSNorm,
    _rotate_half,
    rope_index_batch,
    text_rope_index,
)

__all__ = ["Qwen3TextConfig", "Qwen3TextModel", "Qwen3TextDecoder",
           "convert_qwen3_text", "rope_index_batch", "text_rope_index"]


@dataclass(frozen=True)
class Qwen3TextConfig:
    # Qwen3-VL-2B language model; tests override with tiny dims
    vocab_size: int = 151936
    hidden_size: int = 2048
    intermediate_size: int = 6144
    num_layers: int = 28
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 5e6
    mrope_section: tuple = (24, 20, 20)
    tie_word_embeddings: bool = True
    n_deepstack: int = 3


def interleaved_mrope_cos_sin(position_ids, config, dtype=jnp.float32):
    """(3, B, T) int positions -> (B, T, head_dim) cos/sin with the three
    streams merged by INTERLEAVING (apply_interleaved_mrope): start from
    the temporal stream, then overwrite frequency slots 1, 4, 7, ... with
    H and 2, 5, 8, ... with W (each up to 3 * section)."""
    hd = config.head_dim
    half = hd // 2
    inv_freq = 1.0 / (config.rope_theta ** (
        np.arange(0, hd, 2, dtype=np.float64) / hd))
    freqs = position_ids[..., None].astype(jnp.float32) * jnp.asarray(
        inv_freq, jnp.float32)                        # (3, B, T, half)
    sections = config.mrope_section
    stream = np.zeros(half, np.int32)                 # which stream per slot
    for dim, offset in enumerate((1, 2), start=1):
        idx = np.arange(offset, sections[dim] * 3, 3)
        stream[idx] = dim
    merged = jnp.take_along_axis(
        jnp.moveaxis(freqs, 0, -1),                   # (B, T, half, 3)
        jnp.asarray(stream)[None, None, :, None], axis=-1)[..., 0]
    emb = jnp.concatenate([merged, merged], axis=-1)  # (B, T, hd)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


class Qwen3Attention(nn.Module):
    config: Qwen3TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, mask, cache=None, cache_index=None):
        cfg = self.config
        hd = cfg.head_dim
        b, t, _ = x.shape
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, name=name)
        q = dense(cfg.num_heads * hd, "q_proj")(x).reshape(
            b, t, cfg.num_heads, hd)
        k = dense(cfg.num_kv_heads * hd, "k_proj")(x).reshape(
            b, t, cfg.num_kv_heads, hd)
        v = dense(cfg.num_kv_heads * hd, "v_proj")(x).reshape(
            b, t, cfg.num_kv_heads, hd)
        q = RMSNorm(cfg.rms_norm_eps, name="q_norm")(q)
        k = RMSNorm(cfg.rms_norm_eps, name="k_norm")(k)

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

        groups = cfg.num_heads // cfg.num_kv_heads
        qg = q.reshape(b, t, cfg.num_kv_heads, groups, hd)
        scores = jnp.einsum("btkgd,bskd->bkgts", qg, k_all) * (hd ** -0.5)
        scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
        weights = jax.nn.softmax(
            scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bkgts,bskd->btkgd", weights, v_all)
        out = out.reshape(b, t, cfg.num_heads * hd)
        return dense(cfg.hidden_size, "o_proj")(out), cache


class Qwen3DecoderLayer(nn.Module):
    config: Qwen3TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, mask, cache=None, cache_index=None):
        cfg = self.config
        y = RMSNorm(cfg.rms_norm_eps, name="input_layernorm")(x)
        attn, cache = Qwen3Attention(cfg, self.dtype, name="self_attn")(
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


class Qwen3TextModel(nn.Module):
    """Decoder stack with DeepStack visual injection.

    deepstack: None, or (visual_mask (B, T) bool, [features (B, T, E)]) —
    feature k is added to hidden states after layer k at masked positions
    (features pre-scattered to sequence positions; zeros elsewhere)."""

    config: Qwen3TextConfig = Qwen3TextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeds, position_ids, mask, cache=None,
                 cache_index=None, deepstack=None):
        cfg = self.config
        cos, sin = interleaved_mrope_cos_sin(position_ids, cfg, self.dtype)
        x = embeds.astype(self.dtype)
        new_cache = []
        for i in range(cfg.num_layers):
            layer_cache = None if cache is None else cache[i]
            x, layer_cache = Qwen3DecoderLayer(
                cfg, self.dtype, name=f"layer{i}")(
                x, cos, sin, mask, layer_cache, cache_index)
            new_cache.append(layer_cache)
            if deepstack is not None and i < len(deepstack[1]):
                vis_mask, feats = deepstack
                x = x + jnp.where(vis_mask[:, :, None],
                                  feats[i].astype(x.dtype), 0.0)
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
    """Deterministic random init including the embedding table.

    The model READS the tied embedding table (it never declares it), so a
    plain flax init of a tied config would trace a missing-param error:
    init with the head untied to materialize the full structure, then
    swap lm_head for a generated embed_tokens table when the config ties."""
    import dataclasses

    from facet_tpu.models.checkpoints import fallback_init, sds

    init_cfg = dataclasses.replace(config, tie_word_embeddings=False)
    model = Qwen3TextModel(config)
    params = fallback_init(
        Qwen3TextModel(init_cfg), sds((1, 4, config.hidden_size)),
        sds((3, 1, 4), jnp.int32), sds((1, 4, 4), bool), seed=seed)
    tree = dict(params["params"])
    if config.tie_word_embeddings:
        tree.pop("lm_head", None)
    rng = jax.random.PRNGKey(seed + 1)
    table = jax.random.normal(
        rng, (config.vocab_size, config.hidden_size), jnp.float32) * 0.02
    tree["embed_tokens"] = {"embedding": table}
    return model, {"params": tree}


class Qwen3TextDecoder:
    """Greedy KV-cache generation, one jitted program per shape bucket
    (same scheme as qwen_text.QwenTextDecoder, plus DeepStack prefill)."""

    def __init__(self, params, config=Qwen3TextConfig(), dtype=jnp.float32,
                 max_new_tokens=96, mesh=None):
        """mesh: optional ('dp', 'tp') jax.sharding.Mesh — with tp > 1 the
        decoder weights shard Megatron-style over 'tp' exactly like the
        Qwen2.5 decoder (parallel/tp.py works unchanged: Qwen3 uses the
        same q/k/v/o, gate/up/down, embed_tokens and lm_head leaf names;
        its extra per-head q/k RMSNorm scales are (head_dim,) vectors that
        correctly fall through to replication)."""
        self.config = config
        self.model = Qwen3TextModel(config, dtype)
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

        def run(params, embeds, valid, position_ids, next_pos, eos_ids,
                vis_mask, deep_feats):
            b = embeds.shape[0]
            kv, hd = cfg.num_kv_heads, cfg.head_dim
            cache = [{"k": jnp.zeros((b, total, kv, hd), embeds.dtype),
                      "v": jnp.zeros((b, total, kv, hd), embeds.dtype)}
                     for _ in range(cfg.num_layers)]
            if constrain_cache is not None:
                cache = [constrain_cache(c) for c in cache]
            slot_valid = jnp.concatenate(
                [valid, jnp.zeros((b, self.max_new_tokens), bool)], axis=1)

            causal = jnp.tril(jnp.ones((prompt_len, prompt_len), bool))
            pmask = causal[None] & valid[:, None, :]
            pmask = jnp.pad(
                pmask, ((0, 0), (0, 0), (0, self.max_new_tokens)))
            logits, cache = model.apply(
                params, embeds, position_ids, pmask, cache, 0,
                deepstack=(vis_mask, list(deep_feats)))
            last = jnp.max(jnp.where(valid, jnp.arange(prompt_len)[None, :],
                                     -1), axis=1)
            last = jnp.maximum(last, 0)
            next_logits = logits[jnp.arange(b), last]

            def step(carry, i):
                cache, slot_valid, tok, done, pos = carry
                emb = embed_tokens(params, tok)[:, None, :]
                pos3 = jnp.broadcast_to(pos[None, :, None], (3, b, 1))
                slot_valid = slot_valid.at[:, prompt_len + i].set(~done)
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
            carry = (cache, slot_valid, tok0, done0, next_pos)
            (_, _, _, _, _), rest = jax.lax.scan(
                step, carry, jnp.arange(self.max_new_tokens - 1))
            return jnp.concatenate([tok0[:, None], rest.T], axis=1)

        self._programs[key] = jax.jit(run)
        return self._programs[key]

    def generate(self, embeds, valid, position_ids, next_pos, eos_ids,
                 vis_mask=None, deep_feats=None):
        """numpy in -> (B, max_new_tokens) token ids. vis_mask (B, T) bool
        and deep_feats [ (B, T, E) ] carry the DeepStack features scattered
        to their image-token positions (zeros when no image)."""
        b, t, e = embeds.shape
        if vis_mask is None:
            vis_mask = np.zeros((b, t), bool)
            deep_feats = [np.zeros((b, t, e), np.float32)
                          for _ in range(self.config.n_deepstack)]
        run = self._program(t, b)
        args = (jnp.asarray(embeds), jnp.asarray(valid, bool),
                jnp.asarray(position_ids), jnp.asarray(next_pos, jnp.int32),
                jnp.asarray(eos_ids, jnp.int32), jnp.asarray(vis_mask, bool))
        feats = tuple(jnp.asarray(f) for f in deep_feats)
        if self.mesh is not None:
            # shard batched inputs over 'dp' at transfer time, like the
            # Qwen2.5 decoder — the DeepStack features are n_deepstack
            # extra (B, T, E) tensors, so replicating them to every chip
            # would cost the most of all
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = self.mesh.shape.get("dp", 1)
            bdim = ("dp",) if b % dp == 0 else (None,)
            specs = (P(*bdim, None, None), P(*bdim, None),
                     P(None, *bdim, None), P(*bdim), P(None),
                     P(*bdim, None))
            args = tuple(jax.device_put(a, NamedSharding(self.mesh, s))
                         for a, s in zip(args, specs))
            fspec = NamedSharding(self.mesh, P(*bdim, None, None))
            feats = tuple(jax.device_put(f, fspec) for f in feats)
        out = run(self.params, *args, feats)
        return np.asarray(jax.device_get(out))


def convert_qwen3_text(state_dict, config=None):
    """HF Qwen3-VL state dict -> Qwen3TextModel param tree.

    Key layouts: model.language_model.* (>=4.57), model.* or bare. Map
    verified against a random-init torch instance in tests/test_qwen3_vl.py:
      ...layers.{i}.self_attn.q|k|v|o_proj.weight  layer{i}/self_attn/...
      ...layers.{i}.self_attn.q_norm|k_norm.weight layer{i}/self_attn/...
      ...layers.{i}.mlp.gate|up|down_proj.weight   layer{i}/...
      ...input_layernorm|post_attention_layernorm  layer{i}/...
      ...embed_tokens.weight / norm.weight / lm_head.weight
    """
    config = config or Qwen3TextConfig()
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
    lin = lambda p: {"kernel": f32(sd[p + ".weight"]).T}
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
                "q_proj": lin(f"{L}.self_attn.q_proj"),
                "k_proj": lin(f"{L}.self_attn.k_proj"),
                "v_proj": lin(f"{L}.self_attn.v_proj"),
                "o_proj": lin(f"{L}.self_attn.o_proj"),
                "q_norm": {"scale": f32(sd[f"{L}.self_attn.q_norm.weight"])},
                "k_norm": {"scale": f32(sd[f"{L}.self_attn.k_norm.weight"])},
            },
            "gate_proj": lin(f"{L}.mlp.gate_proj"),
            "up_proj": lin(f"{L}.mlp.up_proj"),
            "down_proj": lin(f"{L}.mlp.down_proj"),
        }
    if not config.tie_word_embeddings:
        params["lm_head"] = {"kernel": f32(sd["lm_head.weight"]).T}
    return {"params": params}
