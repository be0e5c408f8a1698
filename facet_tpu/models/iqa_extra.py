"""HyperIQA and DBCNN no-reference quality models in flax.

Native ports of the remaining members of the reference's quality registry
(models/pyiqa_scorer.py:32-75):

- HyperIQA (Su et al. 2020, 0.90 SRCC KonIQ-10k): ResNet50 backbone; local
  distortion features from the intermediate stages pool into the target
  network's input vector; a hypernetwork on the last stage GENERATES the
  target network's fc weights per image; the target network maps the
  distortion vector to the quality score.
- DBCNN (Zhang et al. 2020, 0.90 SRCC): two feature streams — a deep
  backbone (VGG-16 convs) for authentic distortions and a compact S-CNN for
  synthetic distortions — combined by bilinear pooling (outer product of the
  two feature maps averaged over space) into a linear score head.

Both expose the registry contract: score_batch(images_u8) -> 0-10 scores,
[0,1] native range, 384px bucketed inputs.
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.models.topiq import IMAGENET_MEAN, IMAGENET_STD, ResNet50Stages


# ---------------------------------------------------------------- HyperIQA


class HyperIQANet(nn.Module):
    """(B, S, S, 3) normalized -> (B,) quality in [0, 1]."""

    target_in: int = 224     # distortion vector width
    hyper_hidden: int = 112  # generated fc widths: 224 -> 112 -> 56 -> 1

    @nn.compact
    def __call__(self, x):
        stages = ResNet50Stages(name="backbone")(x)
        b = x.shape[0]

        # local distortion aware features: each stage pools to a slice of
        # the target input vector
        slices = []
        widths = (32, 32, 64, 96)
        for i, (feat, width) in enumerate(zip(stages, widths)):
            pooled = feat.mean(axis=(1, 2))
            slices.append(nn.Dense(width, name=f"lda{i}")(pooled))
        target_in = jnp.concatenate(slices, axis=1)          # (B, 224)

        # hypernetwork: generate the target fc weights from semantics
        sem = stages[-1].mean(axis=(1, 2))                   # (B, 2048)
        sem = nn.relu(nn.Dense(512, name="hyper0")(sem))

        dims = [(self.target_in, self.hyper_hidden),
                (self.hyper_hidden, self.hyper_hidden // 2),
                (self.hyper_hidden // 2, 1)]
        h = target_in
        for li, (din, dout) in enumerate(dims):
            w = nn.Dense(din * dout, name=f"gen_w{li}")(sem)
            bias = nn.Dense(dout, name=f"gen_b{li}")(sem)
            w = w.reshape(b, din, dout)
            h = jnp.einsum("bi,bio->bo", h, w) + bias
            if li < len(dims) - 1:
                h = nn.relu(h)
        return jax.nn.sigmoid(h[:, 0])


# ------------------------------------------------------------------ DBCNN


class VGGConvs(nn.Module):
    """VGG-16 convolutional stack -> (B, H/16, W/16, 512)."""

    @nn.compact
    def __call__(self, x):
        plan = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        for stage, (feats, convs) in enumerate(plan):
            for i in range(convs):
                x = nn.Conv(feats, (3, 3), padding=1,
                            name=f"conv{stage}_{i}")(x)
                x = nn.relu(x)
            if stage < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class SCNN(nn.Module):
    """Compact synthetic-distortion stream -> (B, h, w, 128)."""

    @nn.compact
    def __call__(self, x):
        for i, feats in enumerate((48, 48, 64, 64, 64, 128)):
            stride = 2 if i % 2 == 0 else 1
            x = nn.Conv(feats, (3, 3), strides=(stride, stride), padding=1,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=True)(x)
            x = nn.relu(x)
        return x


class DBCNNNet(nn.Module):
    """(B, S, S, 3) normalized -> (B,) quality in [0, 1]."""

    @nn.compact
    def __call__(self, x):
        deep = VGGConvs(name="vgg")(x)          # (B, h1, w1, 512)
        synth = SCNN(name="scnn")(x)            # (B, h2, w2, 128)
        # align spatial grids for the bilinear pool
        b, h1, w1, c1 = deep.shape
        synth = jax.image.resize(synth, (b, h1, w1, synth.shape[-1]),
                                 "bilinear")
        # bilinear pooling: spatial average of the outer product
        bilinear = jnp.einsum("bhwc,bhwd->bcd", deep, synth) / (h1 * w1)
        flat = bilinear.reshape(b, -1)
        # signed sqrt + l2 normalization (standard bilinear-CNN practice)
        flat = jnp.sign(flat) * jnp.sqrt(jnp.abs(flat) + 1e-8)
        flat = flat / (jnp.linalg.norm(flat, axis=1, keepdims=True) + 1e-8)
        return jax.nn.sigmoid(nn.Dense(1, name="head")(flat)[:, 0])


# ------------------------------------------------------------- scorer glue


@dataclass
class _IQAWrapper:
    net: object
    params: dict
    input_size: int = 384
    score_range = (0.0, 1.0)

    def __post_init__(self):
        self._forward = jax.jit(self.net.apply)

    def host_params(self):
        return {"params": jax.tree.map(np.asarray, self.params)}

    def score_batch(self, images):
        from facet_tpu.ops.resize import resize_batch

        if not images:
            return []
        size = self.input_size
        crops = np.empty((len(images), size, size, 3), np.float32)
        by_shape = {}
        for i, img in enumerate(images):
            by_shape.setdefault(img.shape[:2], []).append(i)
        for (h, w), idxs in by_shape.items():
            batch = np.stack([images[i] for i in idxs])
            crops[idxs] = np.asarray(jax.device_get(
                resize_batch(batch, size, size, method="linear")))
        x = (crops / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        raw = np.asarray(jax.device_get(self._forward(self.params, jnp.asarray(x))))
        return [round(float(np.clip(r, 0, 1)) * 10.0, 2) for r in raw]


def _make(net_cls, checkpoint_name, seed, config=None, cached=None,
          input_size=384):
    from facet_tpu.models.checkpoints import (
        load_or_none, _warn_once, fallback_init, sds)

    net = net_cls()
    if cached is not None:
        return _IQAWrapper(net, cached["params"], input_size)
    params = load_or_none(checkpoint_name)
    if params is None:
        _warn_once(checkpoint_name)
        params = fallback_init(net, sds((1, input_size, input_size, 3)),
                               seed=seed)
    return _IQAWrapper(net, params, input_size)


class HyperIQAScorer:
    @classmethod
    def create(cls, config=None, cached=None):
        return _make(HyperIQANet, "hyperiqa", 40, config, cached)


class DBCNNScorer:
    @classmethod
    def create(cls, config=None, cached=None):
        return _make(DBCNNNet, "dbcnn", 41, config, cached)
