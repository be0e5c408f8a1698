"""Exact SCRFD transcription: converter strictness against the mmdet key
vocabulary, numeric parity vs an independent torch replica of the published
architecture, insightface-exact decode, and config inference."""

import numpy as np
import pytest


def tiny_config():
    from facet_tpu.models.scrfd import SCRFDConfig

    return SCRFDConfig(stem_channels=4, base_channels=8,
                       stage_blocks=(1, 2, 1, 1), stage_planes=(8, 12, 12, 16),
                       neck_channels=8, feat_channels=8, stacked_convs=2,
                       input_size=64)


class TestConverterStrict:
    def test_synthetic_10g_round_trip_no_gaps(self):
        """Full det_10g-shaped state dict converts with zero unconsumed
        source keys and zero unfilled module params, and the tree matches
        the module's init structure exactly."""
        import jax
        import jax.numpy as jnp

        from facet_tpu.models.scrfd import (
            SCRFD,
            SCRFD_10G,
            convert_scrfd,
            synthetic_scrfd_state_dict,
        )

        sd = synthetic_scrfd_state_dict(SCRFD_10G)
        tree, report = convert_scrfd(sd, SCRFD_10G, verbose=False)
        assert report["unconsumed"] == []
        assert report["missing"] == []

        model = SCRFD(SCRFD_10G)
        ref = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 128, 128, 3), jnp.float32))
        ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                     jax.tree_util.tree_flatten_with_path(ref)[0]}
        got_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                     jax.tree_util.tree_flatten_with_path(tree)[0]}
        assert ref_paths == got_paths

        outs = model.apply(tree, jnp.zeros((1, 128, 128, 3), jnp.float32))
        assert [o[0].shape for o in outs] == [
            (1, 16, 16, 2), (1, 8, 8, 2), (1, 4, 4, 2)]
        assert outs[0][1].shape == (1, 16, 16, 2, 4)
        assert outs[0][2].shape == (1, 16, 16, 2, 10)

    def test_missing_keys_reported_not_fatal(self):
        from facet_tpu.models.scrfd import (
            SCRFD_10G,
            convert_scrfd,
            synthetic_scrfd_state_dict,
        )

        sd = synthetic_scrfd_state_dict(SCRFD_10G)
        del sd["bbox_head.stride_kps.0.weight"]
        sd["extra.unknown.weight"] = np.zeros((4, 4), np.float32)
        tree, report = convert_scrfd(sd, SCRFD_10G, verbose=False)
        assert "bbox_head.stride_kps.0.weight" in report["missing"]
        assert "extra.unknown.weight" in report["unconsumed"]


class TestTorchParity:
    """Independent torch replica with the exact mmdet module/key layout.
    Loading the synthetic dict with strict=True proves the key vocabulary;
    forward comparison proves conv padding, avg-down and nearest-upsample
    semantics match."""

    def _build_torch(self, cfg):
        torch = pytest.importorskip("torch")
        import torch.nn as tnn
        import torch.nn.functional as F

        class ConvModule(tnn.Module):      # mmcv ConvModule (conv+bn+relu)
            def __init__(self, cin, cout, k, stride=1, norm=True, act=True):
                super().__init__()
                self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2,
                                       bias=not norm)
                if norm:
                    self.bn = tnn.BatchNorm2d(cout)
                self.act = act

            def forward(self, x):
                x = self.conv(x)
                if hasattr(self, "bn"):
                    x = self.bn(x)
                return F.relu(x) if self.act else x

        class PlainConv(tnn.Module):       # ConvModule with no norm/act
            def __init__(self, cin, cout, k, stride=1):
                super().__init__()
                self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2,
                                       bias=True)

            def forward(self, x):
                return self.conv(x)

        class BasicBlock(tnn.Module):
            def __init__(self, cin, planes, stride):
                super().__init__()
                self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(planes)
                self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(planes)
                if stride != 1 or cin != planes:
                    mods = []
                    if stride != 1:
                        mods.append(tnn.AvgPool2d(stride, stride,
                                                  ceil_mode=True,
                                                  count_include_pad=False))
                    mods += [tnn.Conv2d(cin, planes, 1, 1, bias=False),
                             tnn.BatchNorm2d(planes)]
                    self.downsample = tnn.Sequential(*mods)

            def forward(self, x):
                idn = self.downsample(x) if hasattr(self, "downsample") else x
                y = F.relu(self.bn1(self.conv1(x)))
                y = self.bn2(self.conv2(y))
                return F.relu(idn + y)

        class Backbone(tnn.Module):
            def __init__(self):
                super().__init__()
                sc, bc = cfg.stem_channels, cfg.base_channels
                self.stem = tnn.Sequential(
                    tnn.Conv2d(3, sc, 3, 2, 1, bias=False),
                    tnn.BatchNorm2d(sc), tnn.ReLU(inplace=True),
                    tnn.Conv2d(sc, sc, 3, 1, 1, bias=False),
                    tnn.BatchNorm2d(sc), tnn.ReLU(inplace=True),
                    tnn.Conv2d(sc, bc, 3, 1, 1, bias=False),
                    tnn.BatchNorm2d(bc), tnn.ReLU(inplace=True))
                self.maxpool = tnn.MaxPool2d(3, 2, 1)
                cin = bc
                for s, (blocks, planes) in enumerate(zip(
                        cfg.stage_blocks, cfg.stage_planes), start=1):
                    seq = []
                    for i in range(blocks):
                        stride = 2 if (i == 0 and s > 1) else 1
                        seq.append(BasicBlock(cin, planes, stride))
                        cin = planes
                    setattr(self, f"layer{s}", tnn.Sequential(*seq))

            def forward(self, x):
                x = self.maxpool(self.stem(x))
                outs = []
                for s in range(1, len(cfg.stage_blocks) + 1):
                    x = getattr(self, f"layer{s}")(x)
                    outs.append(x)
                return outs

        class Neck(tnn.Module):
            def __init__(self):
                super().__init__()
                c = cfg.neck_channels
                ins = cfg.stage_planes[1:]
                self.lateral_convs = tnn.ModuleList(
                    [PlainConv(i, c, 1) for i in ins])
                self.fpn_convs = tnn.ModuleList(
                    [PlainConv(c, c, 3) for _ in ins])
                self.downsample_convs = tnn.ModuleList(
                    [PlainConv(c, c, 3, 2) for _ in ins[:-1]])
                self.pafpn_convs = tnn.ModuleList(
                    [PlainConv(c, c, 3) for _ in ins[:-1]])

            def forward(self, feats):
                lats = [l(f) for l, f in zip(self.lateral_convs, feats[1:])]
                for i in range(len(lats) - 1, 0, -1):
                    lats[i - 1] = lats[i - 1] + F.interpolate(
                        lats[i], size=lats[i - 1].shape[2:], mode="nearest")
                inter = [conv(l) for conv, l in zip(self.fpn_convs, lats)]
                for i in range(len(inter) - 1):
                    inter[i + 1] = inter[i + 1] + self.downsample_convs[i](
                        inter[i])
                return [inter[0]] + [self.pafpn_convs[i - 1](inter[i])
                                     for i in range(1, len(inter))]

        class Scale(tnn.Module):
            def __init__(self):
                super().__init__()
                self.scale = tnn.Parameter(torch.tensor(1.0))

            def forward(self, x):
                return x * self.scale

        class Head(tnn.Module):
            def __init__(self):
                super().__init__()
                a = cfg.num_anchors
                convs, cin = [], cfg.neck_channels
                for _ in range(cfg.stacked_convs):
                    convs.append(ConvModule(cin, cfg.feat_channels, 3))
                    cin = cfg.feat_channels
                self.cls_stride_convs = tnn.ModuleDict(
                    {"0": tnn.ModuleList(convs)})
                self.stride_cls = tnn.ModuleDict(
                    {"0": tnn.Conv2d(cin, a, 3, 1, 1)})
                self.stride_reg = tnn.ModuleDict(
                    {"0": tnn.Conv2d(cin, a * 4, 3, 1, 1)})
                self.stride_kps = tnn.ModuleDict(
                    {"0": tnn.Conv2d(cin, a * 10, 3, 1, 1)})
                self.scales = tnn.ModuleList(
                    [Scale() for _ in cfg.strides])

            def forward(self, feats):
                outs = []
                for level, feat in enumerate(feats):
                    t = feat
                    for conv in self.cls_stride_convs["0"]:
                        t = conv(t)
                    cls = torch.sigmoid(self.stride_cls["0"](t))
                    reg = self.scales[level](self.stride_reg["0"](t))
                    kps = self.stride_kps["0"](t)
                    outs.append((cls, reg, kps))
                return outs

        class Model(tnn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = Backbone()
                self.neck = Neck()
                self.bbox_head = Head()

            def forward(self, x):
                return self.bbox_head(self.neck(self.backbone(x)))

        return Model().eval()

    def test_forward_parity_vs_torch_replica(self):
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        from facet_tpu.models.scrfd import (
            SCRFD,
            convert_scrfd,
            synthetic_scrfd_state_dict,
        )

        cfg = tiny_config()
        sd = synthetic_scrfd_state_dict(cfg, seed=3)
        model = self._build_torch(cfg)
        # strict load proves the synthetic key vocabulary IS the mmdet one
        model.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
            strict=True)

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

        tree, report = convert_scrfd(sd, cfg, verbose=False)
        assert not report["missing"] and not report["unconsumed"]
        got = SCRFD(cfg).apply(tree, jnp.asarray(x))

        for (wc, wr, wk), (gc, gr, gk) in zip(want, got):
            b, a4, hh, ww = wr.shape
            a = a4 // 4
            np.testing.assert_allclose(
                np.asarray(gc), wc.permute(0, 2, 3, 1).numpy(),
                atol=2e-5, rtol=1e-4)
            np.testing.assert_allclose(
                np.asarray(gr).reshape(b, hh, ww, a4),
                wr.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3)
            np.testing.assert_allclose(
                np.asarray(gk).reshape(b, hh, ww, a * 10),
                wk.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3)


class TestDecode:
    def test_decode_matches_insightface_reference(self):
        """decode_topk == the published scrfd.py numpy decode (centers
        x*stride without offset, distance2bbox / distance2kps)."""
        import jax.numpy as jnp

        from facet_tpu.models.scrfd import decode_topk

        rng = np.random.default_rng(5)
        outputs = []
        strides = (8, 16, 32)
        shapes = [(1, 6, 8, 2), (1, 3, 4, 2), (1, 2, 2, 2)]
        for shape in shapes:
            outputs.append((
                jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32)),
                jnp.asarray(rng.standard_normal(shape + (4,)).astype(
                    np.float32)),
                jnp.asarray(rng.standard_normal(shape + (10,)).astype(
                    np.float32))))

        # independent numpy reference following insightface scrfd.py
        ref = []
        for (scores, dist, kps), stride in zip(outputs, strides):
            _, h, w, a = scores.shape
            centers = np.stack(
                np.mgrid[:h, :w][::-1], axis=-1).astype(np.float32) * stride
            centers = np.stack([centers] * a, axis=2).reshape(-1, 2)
            d = np.asarray(dist).reshape(-1, 4) * stride
            boxes = np.stack([centers[:, 0] - d[:, 0], centers[:, 1] - d[:, 1],
                              centers[:, 0] + d[:, 2], centers[:, 1] + d[:, 3]],
                             axis=-1)
            kp = np.asarray(kps).reshape(-1, 5, 2) * stride + centers[:, None]
            ref.append((np.asarray(scores).reshape(-1), boxes, kp))
        all_scores = np.concatenate([r[0] for r in ref])
        all_boxes = np.concatenate([r[1] for r in ref])
        all_kps = np.concatenate([r[2] for r in ref])

        top, boxes, kps = decode_topk(outputs, strides, k=10)
        order = np.argsort(-all_scores)[:10]
        np.testing.assert_allclose(np.asarray(top)[0], all_scores[order],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(boxes)[0], all_boxes[order],
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(kps)[0], all_kps[order],
                                   rtol=1e-5, atol=1e-4)


class TestConfigInference:
    def test_infer_from_named_manifest(self):
        from facet_tpu.models.scrfd import (
            SCRFD_10G,
            infer_scrfd_config,
            synthetic_scrfd_state_dict,
        )

        sd = synthetic_scrfd_state_dict(SCRFD_10G)
        manifest = [{"name": k, "shape": list(np.shape(v)),
                     "op": "Conv" if k.endswith(".weight")
                     and np.ndim(v) == 4 else "?"}
                    for k, v in sd.items()]
        cfg = infer_scrfd_config(manifest)
        assert cfg.stage_blocks == SCRFD_10G.stage_blocks
        assert cfg.stage_planes == SCRFD_10G.stage_planes
        assert cfg.stem_channels == SCRFD_10G.stem_channels
        assert cfg.neck_channels == SCRFD_10G.neck_channels
        assert cfg.feat_channels == SCRFD_10G.feat_channels
        assert cfg.stacked_convs == SCRFD_10G.stacked_convs
