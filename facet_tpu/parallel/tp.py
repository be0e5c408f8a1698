"""Tensor-parallel parameter sharding for the Qwen text decoders.

The Qwen2.5-VL-7B decoder weighs ~15 GB in bf16 — it does not fit a 16 GB
v5e chip next to its KV cache and activations, so its matmul weights shard
over the mesh's 'tp' axis. (The reference runs the whole model on a single
24 GB GPU — models/model_manager.py:652-667, vlm_tagger.py:45; the TPU
equivalent must shard.)

Placement is the Megatron pattern expressed as GSPMD sharding specs — the
model code is untouched; XLA's SPMD partitioner propagates the specs and
inserts the collectives:

- q/k/v and gate/up kernels split their OUTPUT features (column-parallel),
  so each attention head / MLP slice lives wholly on one chip;
- o_proj and down_proj split their INPUT features (row-parallel) — XLA
  inserts one all-reduce per attention block and one per MLP, riding ICI;
- the embedding table splits the HIDDEN axis (a row gather stays local and
  only the (B, T, E) activation is re-gathered, not the 1 GB table);
- lm_head splits the vocab axis; the greedy argmax reduces across shards;
- norms, and biases of row-parallel layers, replicate.

The KV cache shards its kv-heads axis ('tp' must divide num_kv_heads — 4
for Qwen2.5-VL-7B, so tp in {2, 4}).
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# column-parallel: output features sharded
_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
# row-parallel: input features sharded, bias replicated
_ROW = ("o_proj", "down_proj")


def qwen_text_tp_spec(path, leaf):
    """PartitionSpec for one decoder param leaf (path = flax key tuple)."""
    names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    joined = "/".join(names)
    if joined.endswith("embed_tokens/embedding"):
        return P(None, "tp")
    if leaf.ndim == 2:
        if any(c in joined for c in _COL) and joined.endswith("kernel"):
            return P(None, "tp")
        if any(r in joined for r in _ROW) and joined.endswith("kernel"):
            return P("tp", None)
        if "lm_head" in joined and joined.endswith("kernel"):
            return P(None, "tp")
    if leaf.ndim == 1 and joined.endswith("bias") \
            and any(c in joined for c in _COL):
        return P("tp")
    return P()          # norms, row-parallel biases: replicated


def shard_qwen_text_params(params, mesh):
    """Place a Qwen text param tree onto the mesh per qwen_text_tp_spec."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, qwen_text_tp_spec(path, leaf))),
        params)


def kv_cache_constraint(mesh, dp=True):
    """Sharding constraint for (B, max_len, kv_heads, head_dim) cache
    arrays: kv heads over 'tp', batch over 'dp' (when the batch divides
    the dp size; pass dp=False otherwise to replicate the batch axis)."""
    spec = P("dp" if dp else None, None, "tp", None)

    def apply(cache):
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, spec)) if a.ndim == 4 else a,
            cache)

    return apply


def validate_tp(config, tp):
    """tp must divide the kv heads (each chip owns whole kv heads) and the
    MLP intermediate size."""
    if config.num_kv_heads % tp:
        raise ValueError(
            f"tp={tp} must divide num_kv_heads={config.num_kv_heads}")
    if config.intermediate_size % tp:
        raise ValueError(
            f"tp={tp} must divide intermediate_size={config.intermediate_size}")


def pick_tp(config, n_devices, hbm_gb, fill=0.6):
    """Smallest power-of-two 'tp' that brings the decoder's per-chip
    weights under fill*HBM (leaving room for KV cache + activations), or
    None when it already fits / can't shard. Used by both the VLM tagger
    (mesh construction) and the pass planner (per-chip HBM accounting)."""
    budget = fill * hbm_gb
    if n_devices < 2 or decoder_hbm_gb(config) <= budget:
        return None
    tp = 2
    while tp < n_devices and decoder_hbm_gb(config, tp) > budget:
        tp *= 2
    if tp > n_devices or config.num_kv_heads % tp \
            or config.intermediate_size % tp:
        return None
    return tp


def decoder_hbm_gb(config, tp=1, dtype_bytes=2):
    """Per-chip decoder parameter HBM after 'tp'-sharding (embedding and
    lm_head included; norms replicate but are negligible)."""
    e, inter, v = config.hidden_size, config.intermediate_size, config.vocab_size
    hd, nh, kv = config.head_dim, config.num_heads, config.num_kv_heads
    per_layer = (e * nh * hd + 2 * e * kv * hd + nh * hd * e      # qkv + o
                 + 3 * e * inter)                                 # mlp
    total = config.num_layers * per_layer + 2 * v * e             # embed + head
    return total / tp * dtype_bytes / 1e9
