"""Exact SCRFD face detector (insightface buffalo_l det_10g) in flax.

Transcription of the scrfd_10g_bnkps model family the reference drives
through onnxruntime (analyzers/face.py:29-39, det_10g.onnx):

- backbone: ResNetV1e — deep 3x3x3 stem (stride 2 + maxpool), BasicBlocks
  with avg-down shortcuts (AvgPool2d ceil_mode, count_include_pad=False,
  then 1x1 conv s1 + BN), NAS-searched stage layout
  blocks=(3, 4, 2, 3) / planes=(56, 88, 88, 224) for the 10G variant;
- neck: PAFPN over C3/C4/C5 (start_level 1) at 56 channels — lateral 1x1,
  nearest top-down, 3x3 fpn convs, then the bottom-up path-aggregation pass
  (3x3 s2 downsample adds + 3x3 pafpn convs); plain convs with bias, no
  norm/act (mmdet FPN defaults);
- head: SCRFDHead shared across strides (strides_share) with cls/reg
  sharing one stack (cls_reg_share) of 4 ConvModules (3x3 + BN + ReLU,
  56->80 then 80->80), heads 3x3 convs: cls (1 class x 2 anchors,
  bias prior 1%), reg (4 x 2 distances), kps (10 x 2), optional per-stride
  scalar Scale on reg.

Decode matches insightface's scrfd.py runtime exactly: anchor centers are
(x, y) * stride with NO half-pixel offset, two anchors per cell share one
center, distances are multiplied by the stride, scores are sigmoid.

Converters:
- convert_scrfd(): name-mapped from the mmdet-style torch state dict the
  ONNX export preserves (backbone.stem.0.weight, backbone.layer1.0.conv1.*,
  neck.lateral_convs.0.conv.*, bbox_head.cls_stride_convs.0.{i}.conv/bn.*,
  bbox_head.stride_cls.0.*, bbox_head.scales.{i}.scale). Self-diagnosing:
  prints every unconsumed source key and every unfilled module param.
- infer_scrfd_config(): derives the stage layout from an ONNX initializer
  manifest (tools/convert_insightface.py --manifest) so variants other than
  10G reconstruct without hand-editing.

Synthetic state dicts with the exact declared names/shapes round-trip in
tests/test_scrfd.py, which also checks numeric parity against an
independent torch replica of the published architecture (padding, avg-down
ceil semantics, nearest upsampling).
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SCRFDConfig:
    stem_channels: int = 28                 # first two stem convs
    base_channels: int = 56                 # stem output / stage-1 input
    stage_blocks: tuple = (3, 4, 2, 3)
    stage_planes: tuple = (56, 88, 88, 224)
    neck_channels: int = 56
    feat_channels: int = 80
    stacked_convs: int = 4
    num_anchors: int = 2
    strides: tuple = (8, 16, 32)
    input_size: int = 640
    use_scale: bool = True


SCRFD_10G = SCRFDConfig()


# ---------------------------------------------------------------------------
# Building blocks with torch-exact semantics
# ---------------------------------------------------------------------------


def _conv(features, kernel, stride=1, bias=False, name=None, dtype=jnp.float32):
    """torch Conv2d(k, stride, padding=k//2): explicit symmetric padding
    (flax "SAME" pads asymmetrically for even strides)."""
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=bias,
                   name=name, dtype=dtype)


def _bn(name=None):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


def avg_pool_ceil(x, k):
    """AvgPool2d(k, k, ceil_mode=True, count_include_pad=False)."""
    b, h, w, c = x.shape
    ph, pw = (-h) % k, (-w) % k
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        counts = jnp.pad(jnp.ones((h, w), x.dtype),
                         ((0, ph), (0, pw)))
        counts = counts.reshape(1, (h + ph) // k, k, (w + pw) // k, k,
                                1).sum(axis=(2, 4))
    else:
        counts = float(k * k)
    s = x.reshape(b, (h + ph) // k, k, (w + pw) // k, k, c).sum(axis=(2, 4))
    return s / counts


def upsample_nearest(x, out_h, out_w):
    """F.interpolate(mode='nearest', size=...): floor index mapping."""
    h, w = x.shape[1:3]
    if out_h == 2 * h and out_w == 2 * w:
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ri = (jnp.arange(out_h) * h) // out_h
    ci = (jnp.arange(out_w) * w) // out_w
    return x[:, ri][:, :, ci]


class BasicBlockV1e(nn.Module):
    """mmcv BasicBlock with avg_down shortcut (ResNetV1d/e)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = _conv(self.planes, 3, self.stride, name="conv1",
                  dtype=self.dtype)(x)
        y = _bn("bn1")(y)
        y = nn.relu(y)
        y = _conv(self.planes, 3, 1, name="conv2", dtype=self.dtype)(y)
        y = _bn("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            if self.stride != 1:     # avg_down: pool then 1x1 s1
                x = avg_pool_ceil(x, self.stride)
            x = nn.Conv(self.planes, (1, 1), use_bias=False,
                        dtype=self.dtype, name="down_conv")(x)
            x = _bn("down_bn")(x)
        return nn.relu(x + y)


class ResNetV1e(nn.Module):
    config: SCRFDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = _conv(cfg.stem_channels, 3, 2, name="stem0", dtype=self.dtype)(x)
        x = nn.relu(_bn("stem_bn0")(x))
        x = _conv(cfg.stem_channels, 3, 1, name="stem1", dtype=self.dtype)(x)
        x = nn.relu(_bn("stem_bn1")(x))
        x = _conv(cfg.base_channels, 3, 1, name="stem2", dtype=self.dtype)(x)
        x = nn.relu(_bn("stem_bn2")(x))
        # MaxPool2d(3, 2, padding=1)
        x = nn.max_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                constant_values=-jnp.inf),
                        (3, 3), (2, 2), padding="VALID")
        outs = []
        for stage, (blocks, planes) in enumerate(
                zip(cfg.stage_blocks, cfg.stage_planes), start=1):
            for i in range(blocks):
                stride = 2 if (i == 0 and stage > 1) else 1
                x = BasicBlockV1e(planes, stride, self.dtype,
                                  name=f"layer{stage}_{i}")(x)
            outs.append(x)
        return outs     # C2..C5 at strides 4/8/16/32


class PAFPN(nn.Module):
    """mmdet PAFPN, start_level 1, num_outs 3, no norm/act."""

    config: SCRFDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        c = self.config.neck_channels
        inputs = feats[1:]            # start_level=1 -> C3/C4/C5
        laterals = [nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                            name=f"lateral{i}")(f)
                    for i, f in enumerate(inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + upsample_nearest(
                laterals[i], h, w)
        inter = [_conv(c, 3, 1, bias=True, name=f"fpn{i}",
                       dtype=self.dtype)(laterals[i])
                 for i in range(len(laterals))]
        for i in range(len(inter) - 1):
            inter[i + 1] = inter[i + 1] + _conv(
                c, 3, 2, bias=True, name=f"downsample{i}",
                dtype=self.dtype)(inter[i])
        outs = [inter[0]] + [
            _conv(c, 3, 1, bias=True, name=f"pafpn{i - 1}",
                  dtype=self.dtype)(inter[i])
            for i in range(1, len(inter))]
        return outs


class SCRFDHead(nn.Module):
    """Shared head (strides_share + cls_reg_share): one ConvModule stack,
    cls/reg/kps 3x3 convs, per-stride scalar scale on reg."""

    config: SCRFDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        cfg = self.config
        a = cfg.num_anchors
        convs = [( _conv(cfg.feat_channels, 3, 1, name=f"conv{i}",
                         dtype=self.dtype),
                   _bn(f"bn{i}")) for i in range(cfg.stacked_convs)]
        cls_conv = nn.Conv(a, (3, 3), padding=((1, 1), (1, 1)),
                           bias_init=nn.initializers.constant(-4.595),
                           dtype=self.dtype, name="cls")
        reg_conv = nn.Conv(a * 4, (3, 3), padding=((1, 1), (1, 1)),
                           dtype=self.dtype, name="reg")
        kps_conv = nn.Conv(a * 10, (3, 3), padding=((1, 1), (1, 1)),
                           dtype=self.dtype, name="kps")
        outputs = []
        for level, feat in enumerate(feats):
            t = feat
            for conv, bn in convs:
                t = nn.relu(bn(conv(t)))
            cls = jax.nn.sigmoid(cls_conv(t))
            reg = reg_conv(t)
            if cfg.use_scale:
                scale = self.param(f"scale{level}",
                                   nn.initializers.ones, ())
                reg = reg * scale
            kps = kps_conv(t)
            b, h, w, _ = cls.shape
            outputs.append((cls, reg.reshape(b, h, w, a, 4),
                            kps.reshape(b, h, w, a, 10)))
        return outputs


class SCRFD(nn.Module):
    """det_10g: (B, S, S, 3) normalized input -> per-stride
    (scores (B,H,W,A), distances (B,H,W,A,4), kps (B,H,W,A,10)).

    Distances/kps are in stride units like the ONNX outputs; decode_topk
    applies the stride and the no-offset anchor centers."""

    config: SCRFDConfig = SCRFD_10G
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = ResNetV1e(self.config, self.dtype, name="backbone")(x)
        feats = PAFPN(self.config, self.dtype, name="neck")(feats)
        return SCRFDHead(self.config, self.dtype, name="head")(feats)


# ---------------------------------------------------------------------------
# Converter: mmdet-style torch/ONNX state dict -> flax param tree
# ---------------------------------------------------------------------------


def _strip_prefixes(state_dict):
    sd = {}
    for k, v in state_dict.items():
        k = k.split("::")[-1]
        for prefix in ("module.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        sd[k] = np.asarray(v)
    return sd


def convert_scrfd(state_dict, config=SCRFD_10G, verbose=True):
    """mmdet SCRFD state dict (torch names, which the ONNX export keeps as
    initializer names) -> {params, batch_stats} for SCRFD.

    Key map (source -> flax):
      backbone.stem.{0,3,6}.weight            backbone/stem{0,1,2}/kernel
      backbone.stem.{1,4,7}.*                 backbone/stem_bn{0,1,2}/*
      backbone.layer{s}.{i}.conv1|conv2.*     backbone/layer{s}_{i}/...
      backbone.layer{s}.{i}.bn1|bn2.*         backbone/layer{s}_{i}/...
      backbone.layer{s}.{i}.downsample.1|2.*  backbone/layer{s}_{i}/down_*
                       (stride-1 shortcut: downsample.0|1 — no avgpool slot)
      neck.lateral_convs.{i}.conv.*           neck/lateral{i}
      neck.fpn_convs.{i}.conv.*               neck/fpn{i}
      neck.downsample_convs.{i}.conv.*        neck/downsample{i}
      neck.pafpn_convs.{i}.conv.*             neck/pafpn{i}
      bbox_head.cls_stride_convs.0.{i}.conv.* head/conv{i}
      bbox_head.cls_stride_convs.0.{i}.bn.*   head/bn{i}
      bbox_head.stride_cls.0.*                head/cls
      bbox_head.stride_reg.0.*                head/reg
      bbox_head.stride_kps.0.*                head/kps
      bbox_head.scales.{i}.scale              head/scale{i}
    """
    sd = _strip_prefixes(state_dict)
    used = set()
    missing = []

    def take(key):
        if key in sd:
            used.add(key)
            return sd[key].astype(np.float32)
        missing.append(key)
        return None

    def conv(key):
        w = take(key + ".weight")
        out = {}
        if w is not None:
            out["kernel"] = w.transpose(2, 3, 1, 0)   # OIHW -> HWIO
        b = sd.get(key + ".bias")
        if b is not None:
            used.add(key + ".bias")
            out["bias"] = b.astype(np.float32)
        return out

    def bn(key):
        p, s = {}, {}
        for src, dst, tree in ((".weight", "scale", p), (".bias", "bias", p),
                               (".running_mean", "mean", s),
                               (".running_var", "var", s)):
            v = take(key + src)
            if v is not None:
                tree[dst] = v
        return p, s

    params = {"backbone": {}, "neck": {}, "head": {}}
    stats = {"backbone": {}, "neck": {}, "head": {}}

    for i, src in enumerate((0, 3, 6)):
        params["backbone"][f"stem{i}"] = conv(f"backbone.stem.{src}")
        p, s = bn(f"backbone.stem.{src + 1}")
        params["backbone"][f"stem_bn{i}"] = p
        stats["backbone"][f"stem_bn{i}"] = s

    in_ch = config.base_channels
    for stage, (blocks, planes) in enumerate(
            zip(config.stage_blocks, config.stage_planes), start=1):
        for i in range(blocks):
            src = f"backbone.layer{stage}.{i}"
            dst_p, dst_s = {}, {}
            for cname in ("conv1", "conv2"):
                dst_p[cname] = conv(f"{src}.{cname}")
            for bname in ("bn1", "bn2"):
                p, s = bn(f"{src}.{bname}")
                dst_p[bname] = p
                dst_s[bname] = s
            stride = 2 if (i == 0 and stage > 1) else 1
            if i == 0 and (stride != 1 or in_ch != planes):
                # avg_down inserts AvgPool at index 0 only when strided
                base = 1 if stride != 1 else 0
                dst_p["down_conv"] = conv(f"{src}.downsample.{base}")
                p, s = bn(f"{src}.downsample.{base + 1}")
                dst_p["down_bn"] = p
                dst_s["down_bn"] = s
            params["backbone"][f"layer{stage}_{i}"] = dst_p
            stats["backbone"][f"layer{stage}_{i}"] = dst_s
            in_ch = planes

    n_lat = len(config.strides)
    for i in range(n_lat):
        params["neck"][f"lateral{i}"] = conv(f"neck.lateral_convs.{i}.conv")
        params["neck"][f"fpn{i}"] = conv(f"neck.fpn_convs.{i}.conv")
    for i in range(n_lat - 1):
        params["neck"][f"downsample{i}"] = conv(
            f"neck.downsample_convs.{i}.conv")
        params["neck"][f"pafpn{i}"] = conv(f"neck.pafpn_convs.{i}.conv")

    for i in range(config.stacked_convs):
        params["head"][f"conv{i}"] = conv(
            f"bbox_head.cls_stride_convs.0.{i}.conv")
        p, s = bn(f"bbox_head.cls_stride_convs.0.{i}.bn")
        params["head"][f"bn{i}"] = p
        stats["head"][f"bn{i}"] = s
    for src, dst in (("stride_cls", "cls"), ("stride_reg", "reg"),
                     ("stride_kps", "kps")):
        params["head"][dst] = conv(f"bbox_head.{src}.0")
    if config.use_scale:
        for i in range(len(config.strides)):
            v = take(f"bbox_head.scales.{i}.scale")
            params["head"][f"scale{i}"] = (
                np.float32(1.0) if v is None else v.reshape(()))

    unconsumed = sorted(k for k in sd if k not in used
                        and "num_batches_tracked" not in k)
    if verbose:
        for k in unconsumed:
            print(f"convert_scrfd: unconsumed source key {k} {sd[k].shape}")
        for k in missing:
            print(f"convert_scrfd: missing source key {k} (kept init)")
    return ({"params": params, "batch_stats": stats},
            {"unconsumed": unconsumed, "missing": missing})


def synthetic_scrfd_state_dict(config=SCRFD_10G, seed=0):
    """Random state dict with the exact mmdet key vocabulary/shapes the
    real det_10g export carries — the offline converter proof."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(key, cout, cin, k, bias=False):
        sd[key + ".weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05
        if bias:
            sd[key + ".bias"] = rng.standard_normal(cout).astype(np.float32)

    def bn(key, c):
        sd[key + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[key + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[key + ".running_mean"] = rng.standard_normal(c).astype(
            np.float32) * 0.1
        sd[key + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[key + ".num_batches_tracked"] = np.array(1000, np.int64)

    sc, bc = config.stem_channels, config.base_channels
    for i, (cin, cout) in enumerate(((3, sc), (sc, sc), (sc, bc))):
        conv(f"backbone.stem.{i * 3}", cout, cin, 3)
        bn(f"backbone.stem.{i * 3 + 1}", cout)
    in_ch = bc
    for stage, (blocks, planes) in enumerate(
            zip(config.stage_blocks, config.stage_planes), start=1):
        for i in range(blocks):
            key = f"backbone.layer{stage}.{i}"
            conv(f"{key}.conv1", planes, in_ch, 3)
            bn(f"{key}.bn1", planes)
            conv(f"{key}.conv2", planes, planes, 3)
            bn(f"{key}.bn2", planes)
            stride = 2 if (i == 0 and stage > 1) else 1
            if i == 0 and (stride != 1 or in_ch != planes):
                base = 1 if stride != 1 else 0
                conv(f"{key}.downsample.{base}", planes, in_ch, 1)
                bn(f"{key}.downsample.{base + 1}", planes)
            in_ch = planes
    nc = config.neck_channels
    for i, cin in enumerate(config.stage_planes[1:]):
        conv(f"neck.lateral_convs.{i}.conv", nc, cin, 1, bias=True)
        conv(f"neck.fpn_convs.{i}.conv", nc, nc, 3, bias=True)
    for i in range(len(config.strides) - 1):
        conv(f"neck.downsample_convs.{i}.conv", nc, nc, 3, bias=True)
        conv(f"neck.pafpn_convs.{i}.conv", nc, nc, 3, bias=True)
    ch = nc
    for i in range(config.stacked_convs):
        conv(f"bbox_head.cls_stride_convs.0.{i}.conv",
             config.feat_channels, ch, 3)
        bn(f"bbox_head.cls_stride_convs.0.{i}.bn", config.feat_channels)
        ch = config.feat_channels
    a = config.num_anchors
    conv("bbox_head.stride_cls.0", a, ch, 3, bias=True)
    conv("bbox_head.stride_reg.0", a * 4, ch, 3, bias=True)
    conv("bbox_head.stride_kps.0", a * 10, ch, 3, bias=True)
    if config.use_scale:
        for i in range(len(config.strides)):
            sd[f"bbox_head.scales.{i}.scale"] = np.array(
                rng.uniform(0.8, 1.2), np.float32)
    return sd


def infer_scrfd_config(manifest):
    """Derive an SCRFDConfig from an ONNX initializer manifest
    ([{'name','shape','op'}] in graph order, tools/convert_insightface.py).

    Works from names when the export preserved them (backbone.layerS.I...),
    else from conv shapes in graph order: the three stem convs fix the stem
    widths; stage boundaries are where a 3x3 conv changes channel count or
    a 1x1 downsample appears; the neck/head dims come from the first
    lateral 1x1 and the head stack."""
    convs = [m for m in manifest
             if m["op"] == "Conv" and len(m["shape"]) == 4]
    names = [m["name"] for m in convs]
    if any(".stem." in n for n in names):        # name-based (exact)
        import re

        stem = [m for m in convs if ".stem." in m["name"]]
        stem_channels = stem[0]["shape"][0]
        base_channels = stem[-1]["shape"][0]
        stages = {}
        for m in convs:
            g = re.search(r"layer(\d+)\.(\d+)\.conv1\.", m["name"])
            if g:
                s = int(g.group(1))
                stages.setdefault(s, {"blocks": 0, "planes": m["shape"][0]})
                stages[s]["blocks"] = max(stages[s]["blocks"],
                                          int(g.group(2)) + 1)
        order = sorted(stages)
        lat = [m for m in convs if "lateral_convs" in m["name"]]
        head = [m for m in convs if "cls_stride_convs" in m["name"]]
        cls = [m for m in convs if "stride_cls" in m["name"]]
        return SCRFDConfig(
            stem_channels=stem_channels, base_channels=base_channels,
            stage_blocks=tuple(stages[s]["blocks"] for s in order),
            stage_planes=tuple(stages[s]["planes"] for s in order),
            neck_channels=lat[0]["shape"][0] if lat else 56,
            feat_channels=head[0]["shape"][0] if head else 80,
            stacked_convs=len(head) or 4,
            num_anchors=cls[0]["shape"][0] if cls else 2,
            use_scale=any(m["shape"] == [] or m["shape"] == [1]
                          for m in manifest if "scale" in m["name"].lower()))

    # shape-based: stem = first three 3x3 convs (3 -> s -> s -> b)
    shapes = [tuple(m["shape"]) for m in convs]
    assert shapes[0][1] == 3, "first conv must consume RGB"
    stem_channels = shapes[0][0]
    base_channels = shapes[2][0]
    # walk BasicBlocks: conv1 (planes, in, 3, 3), conv2 (planes, planes,
    # 3, 3), optional 1x1 downsample; a stage ends when conv1's input
    # channels change
    i = 3
    stage_blocks, stage_planes = [], []
    cur_planes, cur_blocks, in_ch = None, 0, base_channels
    while i < len(shapes) and shapes[i][2] == 3:
        planes = shapes[i][0]
        if shapes[i][1] != in_ch and cur_planes is not None:
            break       # neck begins (unexpected under this walk)
        if cur_planes is not None and (
                planes != cur_planes or shapes[i][1] != cur_planes):
            stage_blocks.append(cur_blocks)
            stage_planes.append(cur_planes)
            cur_blocks = 0
        cur_planes = planes
        cur_blocks += 1
        i += 2          # conv1 + conv2
        if i < len(shapes) and shapes[i][2] == 1 and shapes[i][0] == planes:
            i += 1      # downsample 1x1
        in_ch = planes
        # stage boundary heuristic: next conv1 input == planes continues
        if i < len(shapes) and shapes[i][2] == 1:
            break
    if cur_planes is not None:
        stage_blocks.append(cur_blocks)
        stage_planes.append(cur_planes)
    one_by_one = [s for s in shapes[i:] if s[2] == 1]
    neck = one_by_one[0][0] if one_by_one else 56
    return SCRFDConfig(stem_channels=stem_channels,
                       base_channels=base_channels,
                       stage_blocks=tuple(stage_blocks),
                       stage_planes=tuple(stage_planes),
                       neck_channels=neck)


def decode_topk(outputs, strides=(8, 16, 32), k=64, center_offset=0.0):
    """Device-side candidate selection: decode every anchor's bbox/kps and
    keep the top-k by score per image.

    insightface-exact decode (scrfd.py distance2bbox/distance2kps): anchor
    centers are (x, y) * stride with no half-pixel offset; distances and
    keypoint offsets are scaled by the stride. Shrinks the device->host
    transfer to k rows (~1 KB/image); host NMS runs over k candidates."""
    all_scores, all_boxes, all_kps = [], [], []
    for (scores, boxes, kps), stride in zip(outputs, strides):
        b, h, w, a = scores.shape
        cx = jnp.broadcast_to(
            ((jnp.arange(w) + center_offset) * stride)[None, None, :, None],
            (b, h, w, a))
        cy = jnp.broadcast_to(
            ((jnp.arange(h) + center_offset) * stride)[None, :, None, None],
            (b, h, w, a))
        d = boxes * stride
        box = jnp.stack([cx - d[..., 0], cy - d[..., 1],
                         cx + d[..., 2], cy + d[..., 3]], axis=-1)
        pts = kps.reshape(b, h, w, a, 5, 2) * stride \
            + jnp.stack([cx, cy], axis=-1)[..., None, :]
        all_scores.append(scores.reshape(b, -1))
        all_boxes.append(box.reshape(b, -1, 4))
        all_kps.append(pts.reshape(b, -1, 5, 2))
    scores = jnp.concatenate(all_scores, axis=1)
    boxes = jnp.concatenate(all_boxes, axis=1)
    kps = jnp.concatenate(all_kps, axis=1)
    k = min(k, scores.shape[1])
    top, idx = jax.lax.top_k(scores, k)
    bb = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    kk = jnp.take_along_axis(kps, idx[..., None, None], axis=1)
    return top, bb, kk
