"""TOPIQ no-reference image quality model in flax (CFANet-style).

The reference's highest-accuracy aesthetic scorer (0.93 SRCC on KonIQ-10k)
comes from pyiqa's TOPIQ — a ResNet50 backbone whose multi-scale features
fuse top-down through cross-scale attention before attention pooling into a
quality score (reference wrapper: models/pyiqa_scorer.py:32-255). This is a
native JAX implementation of that design:

- ResNet50 stages C2..C5 (inference BatchNorm);
- 1x1 projections to a common width, coarse-to-fine cross-attention (each
  finer scale queries the fused coarser context) + self-attention blocks;
- attention pooling -> MLP head -> sigmoid quality in [0, 1];
- engine-facing scores rescale to 0-10 like the reference's normalization
  (pyiqa_scorer.py:166-195), and inputs cap at 1024px long edge to bound
  activation memory (pyiqa_scorer.py:131-164).
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.ops import pallas_attn

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def resolve_topiq_attn_impl(impl="auto"):
    """Pick the cross-scale attention implementation for this backend.

    "auto" -> "pallas" on TPU for the C2 level's 9216x2304 shape (the
    one-pass VMEM kernel keeps ~1 GB/image of score traffic out of HBM —
    measured decision, docs/PERF.md round 4), "xla" on CPU where the
    kernel would run interpreted. The XLA ChunkedAttention path remains
    the parity oracle and handles every shape the kernel gates out.
    FACET_TOPIQ_ATTN overrides for measurement/debugging.
    """
    import os

    impl = os.environ.get("FACET_TOPIQ_ATTN", impl)
    if impl != "auto":
        return impl
    return "xla" if jax.default_backend() == "cpu" else "pallas"


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(y)
        if self.stride != 1 or x.shape[-1] != self.features * 4:
            x = nn.Conv(self.features * 4, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        dtype=self.dtype, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                             name="down_bn")(x)
        return nn.relu(x + y)


class ResNet50Stages(nn.Module):
    """Returns feature maps C2 (s4, 256) .. C5 (s32, 2048)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        stages = []
        for stage, (feats, blocks, stride) in enumerate(
                ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))):
            for i in range(blocks):
                x = Bottleneck(feats, stride if i == 0 else 1, self.dtype,
                               name=f"layer{stage + 1}_{i}")(x)
            stages.append(x)
        return stages


class ChunkedAttention(nn.Module):
    """Drop-in for ``nn.MultiHeadDotProductAttention`` that never
    materializes the full (Q, K) score matrix.

    The C2 cross-attention level attends 9216 queries over 2304 keys: flax's
    stock module writes B x heads x 9216 x 2304 f32 scores (~340 MB/image)
    to HBM, reads them back for the softmax, and reads them again for the
    A@V contraction — the member is HBM-bound, not FLOP-bound. Chunking the
    *query* axis is exact (each score row's softmax is independent), keeps
    every chunk's scores inside one XLA fusion, and bounds live memory to
    B x heads x q_chunk x K. Parameter structure (DenseGeneral query/key/
    value/out) is identical to the stock module, so checkpoints convert
    unchanged (tools/convert_checkpoints.py -> convert.py:attn_block).

    Chunk size is a measured trade (tools/probe_topiq.py, docs/PERF.md):
    ``lax.map`` serializes the chunks, so MANY small steps starve the MXUs
    (9 steps of 1024 ran the f32 member 1.9x slower), while TWO steps of
    4608 match the unchunked program's throughput within 1% AND compile in
    9 s where the full-score f32 einsum takes 124 s.
    """

    num_heads: int
    qkv_features: int
    dtype: jnp.dtype = jnp.float32
    q_chunk: int = 4608

    @nn.compact
    def __call__(self, q_in, kv_in):
        head_dim = self.qkv_features // self.num_heads
        dense = lambda name: nn.DenseGeneral(
            features=(self.num_heads, head_dim), dtype=self.dtype, name=name)
        # (B, Q, H, D) / (B, K, H, D)
        q = dense("query")(q_in) / jnp.sqrt(head_dim).astype(self.dtype)
        k = dense("key")(kv_in)
        v = dense("value")(kv_in)

        nq = q.shape[1]
        if (resolve_topiq_attn_impl() == "pallas"
                and pallas_attn.supported_shape(nq, k.shape[1])):
            out = pallas_attn.cross_attention_pallas(
                q.astype(jnp.float32).swapaxes(1, 2),
                k.astype(jnp.float32).swapaxes(1, 2),
                v.astype(jnp.float32).swapaxes(1, 2),
            ).swapaxes(1, 2).astype(self.dtype)
            return nn.DenseGeneral(features=self.qkv_features, axis=(-2, -1),
                                   dtype=self.dtype, name="out")(out)
        chunk = min(self.q_chunk, nq)

        def attend(q_blk):
            s = jnp.einsum("bqhd,bkhd->bhqk", q_blk, k,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                              preferred_element_type=jnp.float32
                              ).astype(self.dtype)

        if nq % chunk == 0 and nq // chunk > 1:
            blocks = q.reshape(q.shape[0], nq // chunk, chunk,
                               self.num_heads, head_dim)
            out = jax.lax.map(attend, blocks.swapaxes(0, 1)).swapaxes(0, 1)
            out = out.reshape(q.shape[0], nq, self.num_heads, head_dim)
        else:
            out = attend(q)
        return nn.DenseGeneral(features=self.qkv_features, axis=(-2, -1),
                               dtype=self.dtype, name="out")(out)


class CrossAttentionBlock(nn.Module):
    width: int
    heads: int = 4
    dtype: jnp.dtype = jnp.float32
    q_chunk: int = 4608     # bound the (Q, K) score buffer per step

    @nn.compact
    def __call__(self, queries, context):
        q_in = nn.LayerNorm(dtype=jnp.float32)(queries)
        kv_in = nn.LayerNorm(dtype=jnp.float32)(context)
        attn = ChunkedAttention(
            num_heads=self.heads, qkv_features=self.width,
            dtype=self.dtype, q_chunk=self.q_chunk, name="cross")(q_in, kv_in)
        x = queries + attn
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = nn.Dense(self.width * 2, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.width, dtype=self.dtype)(y)
        return x + y


# fast speed tier (processing.speed_tier: "fast"): evaluate at 256px
# instead of 384px — the same accuracy/speed resolution trade the
# reference's pyiqa wrapper makes when it caps inference at 1024px long
# edge (models/pyiqa_scorer.py:131-135). docs/SCORING.md documents it.
FAST_TIER_INPUT_SIZE = 256


@dataclass(frozen=True)
class TOPIQConfig:
    width: int = 256
    heads: int = 4
    input_size: int = 384    # bucketed eval size; long edge capped at 1024
    q_chunk: int = 4608      # query-chunk for the cross-scale attention
    # cross-attention over 9216 C2 tokens needs B x heads x 9216 x 2304 f32
    # score buffers (~340 MB per image) — cap the per-call device batch so
    # activations fit 16 GB HBM (the reference's pyiqa wrapper scores
    # sequentially for the same reason, pyiqa_scorer.py:233-255)
    max_device_batch: int = 16


class TOPIQNet(nn.Module):
    config: TOPIQConfig = TOPIQConfig()
    dtype: jnp.dtype = jnp.float32
    attn_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) ImageNet-normalized -> (B,) quality in [0, 1]."""
        w = self.config.width
        stages = ResNet50Stages(self.dtype, name="backbone")(x)

        tokens = []
        for i, feat in enumerate(stages):
            proj = nn.Conv(w, (1, 1), dtype=self.dtype, name=f"proj{i}")(feat)
            b, fh, fw, _ = proj.shape
            tokens.append(proj.reshape(b, fh * fw, w))

        # coarse-to-fine: each finer scale queries the fused coarser tokens
        fused = tokens[-1]
        fused = CrossAttentionBlock(w, self.config.heads, self.attn_dtype,
                                    self.config.q_chunk,
                                    name="self_top")(fused, fused)
        for level in range(len(tokens) - 2, -1, -1):
            fused = CrossAttentionBlock(
                w, self.config.heads, self.attn_dtype, self.config.q_chunk,
                name=f"cross{level}")(tokens[level], fused)

        # attention pooling
        gate = nn.Dense(1, name="pool_gate")(nn.LayerNorm(name="pool_norm")(fused))
        weights = jax.nn.softmax(gate, axis=1)
        pooled = jnp.sum(fused * weights, axis=1)

        h = nn.LayerNorm(name="head_norm")(pooled)
        h = nn.Dense(w, name="head0")(h)
        h = nn.gelu(h)
        score = nn.Dense(1, name="head1")(h)[:, 0]
        return jax.nn.sigmoid(score)


class TOPIQScorer:
    """Engine-facing wrapper: uint8 images -> 0-10 quality scores."""

    score_range = (0.0, 1.0)

    def __init__(self, params, config=TOPIQConfig(), dtype=jnp.float32):
        self.config = config
        # f32 throughout: bf16 convs measured 55% SLOWER on v5e (and bf16
        # attention never finished compiling) — docs/PERF.md
        self.net = TOPIQNet(config, dtype=dtype)
        self.params = params
        self._programs = {}     # (h, w) -> jitted resize+normalize+forward
        self._placed = None     # params replicated onto the dp mesh
        from facet_tpu.processing.device_pipeline import default_mesh

        self.mesh = default_mesh()

    def _program(self, h, w):
        """One program per source shape: device resize + normalize +
        forward (one device call instead of resize/normalize/forward round
        trips). On a mesh the WHOLE program runs under shard_map over 'dp'
        (params replicated, batch split, zero collectives) — shard_map
        rather than sharding propagation because the TPU attention path is
        a pallas_call (ops/pallas_attn.py), which has no GSPMD partitioning
        rule; propagation would gather the batch at the kernel. Same
        decision as the fused pipeline's entropy kernel
        (processing/device_pipeline.py build_fused_pipeline)."""
        key = (h, w)
        if key not in self._programs:
            from facet_tpu.ops.resize import resample_matrix

            size = self.config.input_size
            rows = jnp.asarray(resample_matrix(h, size, method="linear"))
            cols = jnp.asarray(resample_matrix(w, size, method="linear"))

            def run(params, batch_u8):
                x = batch_u8.astype(jnp.float32)
                x = jnp.einsum("rh,bhwc->brwc", rows, x)
                x = jnp.einsum("sw,brwc->brsc", cols, x) / 255.0
                return self.net.apply(params, (x - IMAGENET_MEAN) / IMAGENET_STD)

            if self.mesh is None:
                prog = jax.jit(run)
            else:
                from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as P

                prog = jax.jit(shard_map(
                    run, mesh=self.mesh,
                    in_specs=(P(), P("dp")), out_specs=P("dp"),
                    check_rep=False))
            self._programs[key] = prog
        return self._programs[key]

    def _run(self, h, w, batch):
        if self.mesh is None:
            return jax.device_get(
                self._program(h, w)(self.params, jnp.asarray(batch)))
        from facet_tpu.parallel.mesh import replicated_sharding, shard_batch

        if self._placed is None:
            self._placed = jax.device_put(
                self.params, replicated_sharding(self.mesh))
        sharded, _ = shard_batch(batch, self.mesh)
        return jax.device_get(self._program(h, w)(self._placed, sharded))

    @classmethod
    def create(cls, config=None, cached=None):
        from dataclasses import replace

        from facet_tpu.models.checkpoints import load_or_none, _warn_once

        tcfg = TOPIQConfig()
        if config is not None and getattr(config, "speed_tier", None):
            if config.speed_tier() == "fast":
                # fast tier: 256px eval (docs/SCORING.md) — every parameter
                # is resolution-agnostic (convs + DenseGenerals, no position
                # embeddings), so the same checkpoint serves both tiers
                tcfg = replace(tcfg, input_size=FAST_TIER_INPUT_SIZE)
        if cached is not None:
            return cls(cached["params"], tcfg)
        params = load_or_none("topiq")
        if params is None:
            _warn_once("topiq")
            params = TOPIQNet(tcfg).init(
                jax.random.PRNGKey(30),
                jnp.zeros((1, tcfg.input_size, tcfg.input_size, 3), jnp.float32))
        return cls(params, tcfg)

    def host_params(self):
        return {"params": jax.tree.map(np.asarray, self.params)}

    def _postprocess(self, raw):
        """Raw metric outputs -> 0-10 engine scores."""
        lo, hi = self.score_range
        return [round(float(np.clip((r - lo) / (hi - lo), 0, 1) * 10.0), 2)
                for r in raw]

    def rider(self, h, w):
        """(run, finish) for joint dispatch on a resident device batch.

        The engine's fused clip pass dispatches this program on the SAME
        device buffer as the fused scoring program when TOPIQ is bin-packed
        into the same pass group — the image batch then crosses the
        host->device link once for the whole group instead of once per
        member (processing/device_pipeline.py score_images). `run` slices
        the resident buffer at the activation cap (per-device cap scaled by
        the mesh size so slice boundaries stay shard-aligned) and returns
        un-fetched device outputs; `finish` takes the fetched outputs and
        the real image count and yields the same 0-10 scores score_batch
        produces.
        """
        prog = self._program(h, w)
        if self.mesh is None:
            params = self.params
            cap = self.config.max_device_batch
        else:
            from facet_tpu.parallel.mesh import replicated_sharding

            if self._placed is None:
                self._placed = jax.device_put(
                    self.params, replicated_sharding(self.mesh))
            params = self._placed
            cap = self.config.max_device_batch * self.mesh.devices.size

        def run(dev):
            return [prog(params, dev[i:i + cap])
                    for i in range(0, dev.shape[0], cap)]

        def finish(fetched, n):
            raw = np.concatenate([np.asarray(o) for o in fetched])[:n]
            return self._postprocess(raw)

        return run, finish

    def score_batch(self, images):
        """RGB uint8 arrays -> list of 0-10 scores (one device call/shape,
        batch-sharded over the chip mesh when one is present)."""
        if not images:
            return []
        raw = np.empty(len(images), np.float32)
        by_shape = {}
        for i, img in enumerate(images):
            by_shape.setdefault(img.shape[:2], []).append(i)
        cap = self.config.max_device_batch
        for (h, w), idxs in by_shape.items():
            for start in range(0, len(idxs), cap):
                part = idxs[start:start + cap]
                batch = np.stack([images[i] for i in part])
                out = np.asarray(self._run(h, w, batch))
                raw[part] = out[:len(part)]  # mesh padding sliced off
        return self._postprocess(raw)
