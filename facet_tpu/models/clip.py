"""CLIP vision + text towers in flax (ViT-L/14 by default).

Native JAX implementation of the architecture the reference consumes through
open_clip (processing/scorer.py:506-531: ViT-L-14 / laion2b_s32b_b82k).
Pre-norm transformer, learned position embeddings, class token, final
layer-norm and linear projection; text tower pools at the EOT (argmax) token
with a causal mask.

TPU notes: compute dtype is bf16 by default (params stay f32). Two attention
paths: "xla" (plain dot-product — the default AND the measured winner) and
"flash" (the pallas flash-attention kernel, measured and rejected). The
round-4 device trace attributed ~0.9 ms/img of the fused program to the
materialized (B, 16, 257, 257) score tensors' softmax passes, but flash
measured SLOWER in the same program (306.3 -> 247.1 img/s at batch 64):
at 257 tokens the kernel's 384-token padding and per-grid-step overhead
cost more than the softmax traffic it saves (block 128 was worse still,
186.2). resolve_attn_impl keeps "xla" on every backend; the flash wrapper
+ parity test remain as the measured record (FACET_ATTN_IMPL=flash to
re-probe). Batches shard over the mesh's data axis via facet_tpu.parallel.
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    projection_dim: int = 768

    @property
    def grid(self):
        return self.image_size // self.patch_size

    @property
    def seq_len(self):
        return self.grid * self.grid + 1


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    projection_dim: int = 768


def _flash_attention(q, k, v, scale):
    """(B, S, H, D) bf16 -> (B, S, H, D) via the pallas flash kernel.

    Pads the sequence to a 128-multiple with a second segment id so padded
    keys are excluded exactly; padded query rows are sliced off. On CPU
    backends the kernel runs in interpreter mode (tests / dryrun).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    b, s, h, d = q.shape
    s_pad = -(-s // 128) * 128
    qt = jnp.swapaxes(q, 1, 2)          # (B, H, S, D)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        qt, kt, vt = (jnp.pad(t, pad) for t in (qt, kt, vt))
    seg = (jnp.arange(s_pad) < s).astype(jnp.int32)[None, :]
    seg = jnp.broadcast_to(seg, (b, s_pad))
    import os

    # probe knob (round-4 record: 384 beat 128 at seq 257; both lost to xla)
    block = min(int(os.environ.get("FACET_FLASH_BLOCK", "512")), s_pad)
    sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block)

    def run():
        return flash_attention(qt, kt, vt,
                               segment_ids=SegmentIds(q=seg, kv=seg),
                               sm_scale=scale, block_sizes=sizes)

    if jax.default_backend() == "cpu":
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = run()
    else:
        out = run()
    return jnp.swapaxes(out[:, :, :s, :], 1, 2).astype(q.dtype)


def resolve_attn_impl(impl="auto"):
    """Pick the attention implementation for the current backend.

    "auto" -> "xla" everywhere. Flash was MEASURED AND REJECTED at this
    sequence length (round 4, fused program at batch 64 on v5e: xla
    306.3 img/s vs flash 247.1 at block 384 and 186.2 at block 128): the
    kernel pads 257 -> 384 tokens and its grid overhead exceeds the
    ~0.9 ms/img of materialized-softmax traffic it eliminates. A
    softmax-ONLY pallas kernel ("psoftmax", ops/pallas_softmax.py) was
    ALSO measured and rejected (round 4, b256: 335.5 xla vs 311.2) —
    the pallas boundary costs more than the reduce passes it saves.
    Both stay implemented + parity-tested as the measured record;
    FACET_ATTN_IMPL={flash,psoftmax} re-enables them for probing.
    """
    import os

    impl = os.environ.get("FACET_ATTN_IMPL", impl)
    if impl != "auto":
        return impl
    return "xla"


class Int8Dense(nn.Module):
    """Drop-in for ``nn.Dense`` with an int8 MXU matmul (w8a8) —
    MEASURED AND REJECTED as a speed tier; kept as the measured record.

    The parameter tree is IDENTICAL to nn.Dense (f32 kernel (in, out) +
    bias), so checkpoints convert/load unchanged: per-output-channel
    weight scales and per-token dynamic activation scales are derived
    in-program, the product runs as an int8xint8->int32 ``dot_general``
    on the MXU's double-rate int8 path, and the result dequantizes via
    the outer product of the two scale vectors (per-token scales keep
    images independent inside a batch; quantization error measured at
    max 0.024 aesthetic-score points on the 0-10 scale).

    Why rejected (round 4, fused member b256 on v5e, docs/PERF.md): raw
    int8 chained matmuls DO run 1.59x bf16 (114.6 vs 72.2 TFLOP/s), but
    in the real program the quant/dequant dataflow costs more than the
    MXU saves — 274.8 img/s (this module) and 313.2 (a static
    per-tensor activation scale with no abs-max pass) vs 349.6 exact
    bf16. FACET_CLIP_INT8=1 re-enables it for probing.
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w_scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=0),
                              1e-8) * (1.0 / 127.0)              # (out,)
        wq = jnp.round(kernel * (1.0 / w_scale)).astype(jnp.int8)
        flat = x.reshape(-1, in_dim).astype(jnp.float32)
        x_scale = jnp.maximum(jnp.max(jnp.abs(flat), axis=1),
                              1e-8) * (1.0 / 127.0)              # (rows,)
        xq = jnp.clip(jnp.round(flat * (1.0 / x_scale)[:, None]),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * (x_scale[:, None] * w_scale[None, :])
             + bias)
        return y.reshape(*x.shape[:-1], self.features).astype(self.dtype)


def resolve_quant_impl(impl="auto"):
    """Pick the projection-matmul implementation for the ViT.

    "auto" -> "none" (exact bf16 everywhere — the parity-tested default
    AND the measured winner: the int8 tier ran SLOWER in the fused
    program, see Int8Dense). "int8" (FACET_CLIP_INT8=1) runs the ViT's
    qkv/out/mlp projections w8a8 on the MXU's double-rate int8 path for
    re-probing; attention scores, softmax, layernorms and the patch
    embed stay exact either way.
    """
    import os

    env = os.environ.get("FACET_CLIP_INT8")
    if env is not None:
        return "int8" if env not in ("", "0", "false") else "none"
    return "none" if impl == "auto" else impl


class Attention(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "xla"
    quant: str = "none"

    @nn.compact
    def __call__(self, x, mask=None):
        head_dim = self.width // self.heads
        dense_cls = Int8Dense if self.quant == "int8" else nn.Dense
        dense = lambda name: dense_cls(self.width, dtype=self.dtype,
                                       name=name)
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        def split(t):
            return t.reshape(*t.shape[:-1], self.heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        scale = head_dim ** -0.5
        if self.attn_impl == "flash" and mask is None:
            out = _flash_attention(q, k, v, scale)
        else:
            # attention entirely in the compute dtype: in bf16 this halves
            # the (B, heads, S, S) logit traffic — measured +5% on the b64
            # ViT-L (fused qkv measured WORSE; probe table in docs/PERF.md).
            # f32 compute keeps the f32 softmax, so parity tests are
            # bit-unchanged.
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
            if mask is not None:
                logits = logits + mask.astype(logits.dtype)
            if self.attn_impl == "psoftmax":
                from facet_tpu.ops.pallas_softmax import softmax_pallas

                weights = softmax_pallas(logits).astype(self.dtype)
            else:
                weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(*out.shape[:-2], self.width)
        dense_out = Int8Dense if self.quant == "int8" else nn.Dense
        return dense_out(self.width, dtype=self.dtype, name="out_proj")(out)


class MLP(nn.Module):
    width: int
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        dense_cls = Int8Dense if self.quant == "int8" else nn.Dense
        x = dense_cls(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return dense_cls(self.width, dtype=self.dtype, name="fc2")(x)


class Block(nn.Module):
    width: int
    heads: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "xla"
    quant: str = "none"

    @nn.compact
    def __call__(self, x, mask=None):
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x)
        x = x + Attention(self.width, self.heads, self.dtype,
                          attn_impl=self.attn_impl, quant=self.quant,
                          name="attn")(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x)
        return x + MLP(self.width, int(self.width * self.mlp_ratio),
                       self.dtype, quant=self.quant, name="mlp")(y)


class CLIPVisionTower(nn.Module):
    """Image -> projected feature vector (e.g. 768-d for ViT-L/14)."""

    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "xla"   # "flash" on TPU hot paths (same params)
    quant: str = "none"      # "int8" = w8a8 projections (same params)

    @nn.compact
    def __call__(self, pixels):
        """pixels: (B, H, W, 3) float32, already CLIP-normalized."""
        cfg = self.config
        # Patchify as a strided conv (maps straight onto the MXU)
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(pixels.astype(self.dtype))
        b = x.shape[0]
        x = x.reshape(b, cfg.grid * cfg.grid, cfg.width)

        cls_token = self.param("class_embedding", nn.initializers.normal(0.02),
                               (cfg.width,))
        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1)

        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.seq_len, cfg.width))
        x = x + pos.astype(self.dtype)

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x).astype(self.dtype)
        for i in range(cfg.layers):
            x = Block(cfg.width, cfg.heads, cfg.mlp_ratio, self.dtype,
                      attn_impl=self.attn_impl, quant=self.quant,
                      name=f"block_{i}")(x)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x[:, 0])
        proj = self.param("projection", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, cfg.projection_dim))
        return (pooled @ proj).astype(jnp.float32)


class CLIPTextTower(nn.Module):
    """Token ids -> projected feature vector, pooled at the EOT token."""

    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, token_ids):
        cfg = self.config
        embed = self.param("token_embedding", nn.initializers.normal(0.02),
                           (cfg.vocab_size, cfg.width))
        x = jnp.take(embed, token_ids, axis=0).astype(self.dtype)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width))
        x = x + pos[: x.shape[1]].astype(self.dtype)

        seq = x.shape[1]
        causal = jnp.triu(jnp.full((seq, seq), -1e9, jnp.float32), k=1)[None, None]
        for i in range(cfg.layers):
            x = Block(cfg.width, cfg.heads, cfg.mlp_ratio, self.dtype,
                      name=f"block_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        eot = jnp.argmax(token_ids, axis=-1)  # highest id = EOT marker
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("projection", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, cfg.projection_dim))
        return (pooled @ proj).astype(jnp.float32)


# CLIP preprocessing constants (open_clip defaults)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_uint8(rgb_u8):
    """(B, 224, 224, 3) uint8 -> CLIP-normalized float32 (jit-safe)."""
    x = rgb_u8.astype(jnp.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


def init_vision_params(rng_seed=0, config=CLIPVisionConfig(), dtype=jnp.bfloat16):
    """Deterministic random init (offline fallback when no checkpoint)."""
    from facet_tpu.models.checkpoints import fallback_init, sds

    model = CLIPVisionTower(config, dtype)
    return model, fallback_init(
        model, sds((1, config.image_size, config.image_size, 3)),
        seed=rng_seed)


def init_text_params(rng_seed=0, config=CLIPTextConfig(), dtype=jnp.bfloat16):
    from facet_tpu.models.checkpoints import fallback_init, sds

    model = CLIPTextTower(config, dtype)
    return model, fallback_init(
        model, sds((1, config.context_length), jnp.int32), seed=rng_seed)
