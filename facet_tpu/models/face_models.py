"""Face model stack in flax: landmarks, recognition, host-side decode.

Native JAX counterparts of the ONNX models the reference drives through
insightface's buffalo_l bundle (analyzers/face.py:29-39):

- detection lives in models/scrfd.py (exact det_10g transcription);
- LandmarkNet: 106-point 2D landmark regressor on 192x192 aligned crops;
- IResNet50: ArcFace recognition backbone on 112x112 aligned crops -> 512-d
  embeddings (exact arcface_torch transcription, verified converter).

All models run as one batched program each; per-face crops across a whole
image batch are gathered host-side then embedded in a single device call.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(x)
        return nn.relu(x) if self.act else x


def topk_to_detections(top, boxes, kps, score_threshold=0.5):
    """Host side of decode_topk: -> per-image list of (score, bbox, kps5)."""
    top = np.asarray(top)
    boxes = np.asarray(boxes)
    kps = np.asarray(kps)
    results = []
    for bi in range(top.shape[0]):
        dets = []
        for j in range(top.shape[1]):
            if top[bi, j] < score_threshold:
                break  # top_k is sorted descending
            dets.append((float(top[bi, j]), boxes[bi, j].astype(np.float32),
                         kps[bi, j].astype(np.float32)))
        results.append(dets)
    return results


def nms(detections, iou_threshold=0.4):
    """Greedy IoU NMS over [(score, bbox, kps)] for one image."""
    if not detections:
        return []
    detections = sorted(detections, key=lambda d: -d[0])
    kept = []
    for det in detections:
        _, box, _ = det
        keep = True
        for _, kb, _ in kept:
            ix1, iy1 = max(box[0], kb[0]), max(box[1], kb[1])
            ix2, iy2 = min(box[2], kb[2]), min(box[3], kb[3])
            inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
            area_a = (box[2] - box[0]) * (box[3] - box[1])
            area_b = (kb[2] - kb[0]) * (kb[3] - kb[1])
            union = area_a + area_b - inter
            if union > 0 and inter / union > iou_threshold:
                keep = False
                break
        if keep:
            kept.append(det)
    return kept


# ---------------------------------------------------------------------------
# ArcFace recognition backbone (iResNet-50 shape)
# ---------------------------------------------------------------------------


class ChannelPReLU(nn.Module):
    """Per-channel PReLU, matching torch nn.PReLU(num_parameters=C)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)


class IRBlock(nn.Module):
    """IBasicBlock, transcribed exactly from the published arcface_torch
    backbone (insightface/recognition/arcface_torch/backbones/iresnet.py):
    bn1 -> conv1(3x3 s1) -> bn2 -> prelu -> conv2(3x3 stride) -> bn3, with a
    conv1x1+bn downsample shortcut. Explicit (1,1) padding matches torch's
    padding=1 semantics for strided convs (flax "SAME" pads asymmetrically)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                         name="bn1")(x)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv1")(y)
        y = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                         name="bn2")(y)
        y = ChannelPReLU(name="prelu")(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                         name="bn3")(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1),
                        strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                             name="down_bn")(x)
        return x + y


class IResNet(nn.Module):
    """ArcFace iresnet-50: 112x112 aligned crop -> 512-d embedding.

    Exact transcription of arcface_torch's IResNet (the buffalo_l
    w600k_r50.onnx graph is exported from it): conv1 3x3 s1 -> bn -> prelu,
    four stages of IBasicBlocks (3/4/14/3, first block of each stage
    stride 2), bn2, channel-first flatten, fc 25088->512, features BN1d.
    Module names mirror the torch attribute names so the converter's key
    map is 1:1 (tools/convert_checkpoints.py convert_arcface)."""

    layers: tuple = (3, 4, 14, 3)   # iresnet50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                         name="bn1")(x)
        x = ChannelPReLU(name="prelu")(x)
        for stage, (blocks, feats) in enumerate(
                zip(self.layers, (64, 128, 256, 512)), start=1):
            for i in range(blocks):
                x = IRBlock(feats, stride=2 if i == 0 else 1,
                            dtype=self.dtype, name=f"layer{stage}_{i}")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                         name="bn2")(x)
        # torch flattens (B, C, H, W) channel-first; match so fc weights load
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.Dense(512, dtype=self.dtype, name="fc")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                         use_scale=True, use_bias=True, name="features")(x)
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# 106-point landmark regressor
# ---------------------------------------------------------------------------


class LandmarkNet(nn.Module):
    """192x192 aligned crop -> (106, 2) landmark coordinates in crop space."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for feats, stride in ((32, 2), (64, 2), (64, 2), (128, 2), (128, 2)):
            x = ConvBN(feats, 3, stride, dtype=self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(256, dtype=self.dtype)(x)
        x = nn.relu(x)
        out = nn.Dense(212, dtype=self.dtype)(x)
        # network regresses normalized [-1, 1]; map to crop pixels
        return (out.reshape(-1, 106, 2) + 1.0) * 96.0


# ---------------------------------------------------------------------------
# Alignment (host): similarity transform to ArcFace canonical 5 points
# ---------------------------------------------------------------------------

ARCFACE_DST = np.array(
    [[38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
     [41.5493, 92.3655], [70.7299, 92.2041]], dtype=np.float32)  # 112x112


def umeyama_similarity(src, dst):
    """Least-squares similarity transform (2x3) mapping src -> dst."""
    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_c = src - src_mean
    dst_c = dst - dst_mean
    cov = dst_c.T @ src_c / src.shape[0]
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u @ vt))
    diag = np.diag([1.0, d])
    rotation = u @ diag @ vt
    var_src = (src_c ** 2).sum() / src.shape[0]
    scale = (s * np.diag(diag)).sum() / var_src if var_src > 0 else 1.0
    t = dst_mean - scale * rotation @ src_mean
    m = np.zeros((2, 3), np.float32)
    m[:, :2] = scale * rotation
    m[:, 2] = t
    return m
