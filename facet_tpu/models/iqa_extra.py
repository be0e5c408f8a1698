"""HyperIQA and DBCNN no-reference quality models in flax.

Exact transcriptions of the remaining members of the reference's quality
registry (models/pyiqa_scorer.py:32-75) from their published sources, so the
published checkpoints (pyiqa `hyperiqa.pth` / `DBCNN.pth`) convert
weight-for-weight (facet_tpu/models/convert.py convert_hyperiqa /
convert_dbcnn; key maps in docs/CONVERTERS.md):

- HyperIQA (Su et al. 2020, 0.90 SRCC KonIQ-10k) — the official
  HyperNet(16, 112, 224, 112, 56, 28, 14, 7): ResNet50 backbone whose four
  stage outputs feed "local distortion aware" 1x1-conv + 7x7-avgpool + fc
  slices concatenated into a 224-d target vector; a hypernetwork of 3x3
  convs over the 7x7 C5 feature map GENERATES a per-image 5-layer target
  network (224 -> 112 -> 56 -> 28 -> 14 -> 1, sigmoid activations) that maps
  the target vector to the quality score. Fixed 224x224 input (the lda fc
  dims bake in the 224 grid; the published model evaluates 224 crops).
- DBCNN (Zhang et al. 2020, 0.90 SRCC) — two feature streams, VGG-16 convs
  (minus the final maxpool) for authentic distortions and the S-CNN stack
  for synthetic distortions, combined by bilinear pooling (spatially
  averaged outer product), sqrt + l2 normalized, linear score head.

Both expose the registry contract: score_batch(images_u8) -> 0-10 scores,
[0,1] native range (the reference registry's declared range for both).

torch-replica parity: tests/test_convert_iqa_extra.py loads the synthetic
published-format state dicts into independent torch transcriptions with
strict=True and pins numeric forward parity against these modules.
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.models.topiq import IMAGENET_MEAN, IMAGENET_STD, ResNet50Stages


def _torch_flatten(x):
    """torch .view(B, -1) on an NCHW tensor == transpose NHWC -> NCHW first."""
    b = x.shape[0]
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)


# ---------------------------------------------------------------- HyperIQA


class HyperIQANet(nn.Module):
    """(B, 224, 224, 3) ImageNet-normalized -> (B,) quality in ~[0, 1].

    Official HyperNet(lda_out=16, hyper_in=112, target_in=224, f1=112,
    f2=56, f3=28, f4=14, feature_size=7). Submodule names mirror the
    published checkpoint's key vocabulary (res.*, conv1.*, fcNw_conv /
    fcNb_fc, fc5w_fc / fc5b_fc) so the converter is a mechanical rename.
    """

    lda_out: int = 16
    hyper_in: int = 112
    target_in: int = 224
    fdims: tuple = (112, 56, 28, 14)
    feature_size: int = 7

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        fs = self.feature_size
        c2, c3, c4, c5 = ResNet50Stages(name="res")(x)

        # local distortion aware slices: conv1x1 (no bias) + 7x7/7 avgpool +
        # channel-first flatten + fc. Grid sizes bake in the 224 input:
        # 56->8, 28->4, 14->2, 7->1.
        def lda(feat, width, idx):
            y = nn.Conv(width, (1, 1), use_bias=False,
                        name=f"lda{idx}_conv")(feat)
            y = nn.avg_pool(y, (7, 7), strides=(7, 7))
            return _torch_flatten(y)

        l1 = nn.Dense(self.lda_out, name="lda1_fc")(lda(c2, 16, 1))
        l2 = nn.Dense(self.lda_out, name="lda2_fc")(lda(c3, 32, 2))
        l3 = nn.Dense(self.lda_out, name="lda3_fc")(lda(c4, 64, 3))
        l4 = nn.Dense(self.target_in - 3 * self.lda_out, name="lda4_fc")(
            _torch_flatten(nn.avg_pool(c5, (7, 7), strides=(7, 7))))
        target_vec = jnp.concatenate([l1, l2, l3, l4], axis=1)  # (B, 224)

        # hypernetwork trunk: three 1x1 convs on C5 -> (B, 7, 7, 112)
        h = c5
        for i, width in enumerate((1024, 512, self.hyper_in)):
            h = nn.relu(nn.Conv(width, (1, 1), name=f"hconv{i}")(h))
        pooled = h.mean(axis=(1, 2))                            # (B, 112)

        # generated target-net weights: 3x3 convs whose (C, 7, 7) output
        # flattens channel-first into the (dout, din) weight matrix —
        # exactly torch's .view(-1, dout, din, 1, 1)
        dims = [self.target_in] + list(self.fdims)
        q = target_vec
        for li in range(4):
            din, dout = dims[li], dims[li + 1]
            wmap = nn.Conv(din * dout // (fs * fs), (3, 3), padding=1,
                           name=f"fc{li + 1}w_conv")(h)
            w = _torch_flatten(wmap).reshape(b, dout, din)
            bias = nn.Dense(dout, name=f"fc{li + 1}b_fc")(pooled)
            q = jax.nn.sigmoid(jnp.einsum("bi,boi->bo", q, w) + bias)
        w5 = nn.Dense(self.fdims[-1], name="fc5w_fc")(pooled)   # (B, 14)
        b5 = nn.Dense(1, name="fc5b_fc")(pooled)                # (B, 1)
        return (jnp.sum(q * w5, axis=1, keepdims=True) + b5)[:, 0]


# ------------------------------------------------------------------ DBCNN


class VGGConvs(nn.Module):
    """VGG-16 conv stack minus the final maxpool -> (B, H/16, W/16, 512).

    Layer names carry the torchvision Sequential indices (conv0, conv2,
    conv5, ...) so the published `features1.N.weight` keys map 1:1.
    """

    @nn.compact
    def __call__(self, x):
        plan = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        idx = 0
        for stage, (feats, convs) in enumerate(plan):
            for _ in range(convs):
                x = nn.Conv(feats, (3, 3), padding=1, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 2                      # conv + relu
            if stage < 4:                     # the 5th maxpool is dropped
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            idx += 1                          # maxpool slot
        return x


class SCNN(nn.Module):
    """The published S-CNN feature stack -> (B, H/16, W/16, 128).

    Nine conv+bn+relu triples, stride 2 on convs 1/3/5/8 (the published
    Sequential: 48,48s2,64,64s2,64,64s2,128,128,128s2). Names carry the
    Sequential indices (conv0/bn1, conv3/bn4, ...) for the converter.
    """

    @nn.compact
    def __call__(self, x):
        plan = ((48, 1), (48, 2), (64, 1), (64, 2), (64, 1), (64, 2),
                (128, 1), (128, 1), (128, 2))
        idx = 0
        for feats, stride in plan:
            x = nn.Conv(feats, (3, 3), strides=(stride, stride), padding=1,
                        name=f"conv{idx}")(x)
            x = nn.BatchNorm(use_running_average=True,
                             name=f"bn{idx + 1}")(x)
            x = nn.relu(x)
            idx += 3                          # conv + bn + relu
        return x


class DBCNNNet(nn.Module):
    """(B, S, S, 3) normalized -> (B,) quality in ~[0, 1]."""

    @nn.compact
    def __call__(self, x):
        deep = VGGConvs(name="features1")(x)    # (B, h1, w1, 512)
        synth = SCNN(name="features2")(x)       # (B, h2, w2, 128)
        b, h1, w1, c1 = deep.shape
        if synth.shape[1:3] != (h1, w1):
            synth = jax.image.resize(synth, (b, h1, w1, synth.shape[-1]),
                                     "bilinear")
        # bilinear pooling: spatial average of the outer product (both
        # streams are post-ReLU, so entries are non-negative)
        bilinear = jnp.einsum("bhwc,bhwd->bcd", deep, synth) / (h1 * w1)
        flat = bilinear.reshape(b, -1)          # (B, 512*128)
        flat = jnp.sqrt(flat + 1e-8)
        flat = flat / (jnp.linalg.norm(flat, axis=1, keepdims=True) + 1e-8)
        return nn.Dense(1, name="fc")(flat)[:, 0]


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
        # the published architecture evaluates 224x224 (the lda grid dims
        # bake the size in); the reference averages random 224 crops, this
        # wrapper deterministically resizes — documented divergence
        return _make(HyperIQANet, "hyperiqa", 40, config, cached,
                     input_size=224)


class DBCNNScorer:
    @classmethod
    def create(cls, config=None, cached=None):
        return _make(DBCNNNet, "dbcnn", 41, config, cached)
