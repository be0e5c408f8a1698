"""HyperIQA + DBCNN converters: published-format state dicts load an
independent torch transcription with strict=True AND the converted flax
modules match that torch forward numerically.

The torch modules below are transcriptions of the PUBLISHED sources —
official HyperIQA models.py (HyperNet(16, 112, 224, 112, 56, 28, 14, 7)
with the lda-augmented torchvision ResNet50 backbone; the same vocabulary
pyiqa's `hyperiqa` checkpoint carries) and DBCNN's DBCNN.py/SCNN.py (VGG-16
features minus final maxpool + S-CNN features + bilinear fc; pyiqa
`DBCNN.pth` vocabulary). They are written here independently of the flax
modules, so agreement pins both the architecture transcription and the
converter key map. This transitively pins our ResNet50Stages numerics
against torchvision's Bottleneck (stride-on-conv2, relu-after-add), which
the structural test in test_convert_resnet50.py does not cover.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional


# ------------------------------------------------- torch resnet50 replica


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, feats, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, feats, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(feats)
        self.conv2 = tnn.Conv2d(feats, feats, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(feats)
        self.conv3 = tnn.Conv2d(feats, feats * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(feats * 4)
        self.downsample = None
        if stride != 1 or cin != feats * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, feats * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(feats * 4))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        return F.relu(idn + self.bn3(self.conv3(y)))


def _make_stage(cin, feats, blocks, stride):
    mods = [TorchBottleneck(cin, feats, stride)]
    for _ in range(blocks - 1):
        mods.append(TorchBottleneck(feats * 4, feats, 1))
    return tnn.Sequential(*mods)


class TorchResNetBackbone(tnn.Module):
    """HyperIQA's lda-augmented resnet50 (official models.py
    ResNetBackbone(16, 224, Bottleneck, [3, 4, 6, 3]))."""

    def __init__(self, lda_out=16, in_chn=224):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = _make_stage(64, 64, 3, 1)
        self.layer2 = _make_stage(256, 128, 4, 2)
        self.layer3 = _make_stage(512, 256, 6, 2)
        self.layer4 = _make_stage(1024, 512, 3, 2)
        self.lda1_pool = tnn.Sequential(
            tnn.Conv2d(256, 16, 1, bias=False), tnn.AvgPool2d(7, 7))
        self.lda1_fc = tnn.Linear(16 * 64, lda_out)
        self.lda2_pool = tnn.Sequential(
            tnn.Conv2d(512, 32, 1, bias=False), tnn.AvgPool2d(7, 7))
        self.lda2_fc = tnn.Linear(32 * 16, lda_out)
        self.lda3_pool = tnn.Sequential(
            tnn.Conv2d(1024, 64, 1, bias=False), tnn.AvgPool2d(7, 7))
        self.lda3_fc = tnn.Linear(64 * 4, lda_out)
        self.lda4_pool = tnn.AvgPool2d(7, 7)
        self.lda4_fc = tnn.Linear(2048, in_chn - lda_out * 3)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        l1 = self.lda1_fc(self.lda1_pool(x).flatten(1))
        x = self.layer2(x)
        l2 = self.lda2_fc(self.lda2_pool(x).flatten(1))
        x = self.layer3(x)
        l3 = self.lda3_fc(self.lda3_pool(x).flatten(1))
        x = self.layer4(x)
        l4 = self.lda4_fc(self.lda4_pool(x).flatten(1))
        return torch.cat([l1, l2, l3, l4], 1), x


class TorchHyperNet(tnn.Module):
    """Official HyperNet(16, 112, 224, 112, 56, 28, 14, 7) + TargetNet
    evaluation (sigmoid between generated fcs, linear fc5)."""

    def __init__(self):
        super().__init__()
        self.hyper_in, self.tgt = 112, 224
        self.f = (112, 56, 28, 14)
        self.res = TorchResNetBackbone()
        self.conv1 = tnn.Sequential(
            tnn.Conv2d(2048, 1024, 1), tnn.ReLU(True),
            tnn.Conv2d(1024, 512, 1), tnn.ReLU(True),
            tnn.Conv2d(512, 112, 1), tnn.ReLU(True))
        dims = (self.tgt,) + self.f
        for li in range(1, 5):
            din, dout = dims[li - 1], dims[li]
            setattr(self, f"fc{li}w_conv",
                    tnn.Conv2d(112, din * dout // 49, 3, padding=1))
            setattr(self, f"fc{li}b_fc", tnn.Linear(112, dout))
        self.fc5w_fc = tnn.Linear(112, 14)
        self.fc5b_fc = tnn.Linear(112, 1)

    def forward(self, img):
        b = img.shape[0]
        vec, c5 = self.res(img)
        h = self.conv1(c5)                       # (B, 112, 7, 7)
        pooled = h.mean(dim=(2, 3))              # (B, 112)
        dims = (self.tgt,) + self.f
        q = vec
        for li in range(1, 5):
            din, dout = dims[li - 1], dims[li]
            w = getattr(self, f"fc{li}w_conv")(h).reshape(b, dout, din)
            bias = getattr(self, f"fc{li}b_fc")(pooled)
            q = torch.sigmoid(torch.einsum("bi,boi->bo", q, w) + bias)
        w5 = self.fc5w_fc(pooled)
        return (q * w5).sum(1) + self.fc5b_fc(pooled)[:, 0]


# ----------------------------------------------------- torch DBCNN replica


def _torch_vgg16_features():
    plan = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
    mods, cin = [], 3
    for stage, (feats, convs) in enumerate(plan):
        for _ in range(convs):
            mods += [tnn.Conv2d(cin, feats, 3, padding=1), tnn.ReLU(True)]
            cin = feats
        mods.append(tnn.MaxPool2d(2, 2))
    return tnn.Sequential(*mods[:-1])            # drop the final maxpool


def _torch_scnn_features():
    plan = ((48, 1), (48, 2), (64, 1), (64, 2), (64, 1), (64, 2),
            (128, 1), (128, 1), (128, 2))
    mods, cin = [], 3
    for feats, stride in plan:
        mods += [tnn.Conv2d(cin, feats, 3, stride, 1),
                 tnn.BatchNorm2d(feats), tnn.ReLU(True)]
        cin = feats
    return tnn.Sequential(*mods)


class TorchDBCNN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.features1 = _torch_vgg16_features()
        self.features2 = _torch_scnn_features()
        self.fc = tnn.Linear(512 * 128, 1)

    def forward(self, x):
        x1 = self.features1(x)                   # (B, 512, h, w)
        x2 = self.features2(x)                   # (B, 128, h2, w2)
        b, _, h, w = x1.shape
        if x2.shape[2:] != (h, w):
            x2 = F.interpolate(x2, (h, w), mode="bilinear",
                               align_corners=False)
        y = torch.bmm(x1.flatten(2), x2.flatten(2).transpose(1, 2)) / (h * w)
        y = y.flatten(1)
        y = torch.sqrt(y + 1e-8)
        y = F.normalize(y)
        return self.fc(y)[:, 0]


# ------------------------------------------------------------------- tests


class TestHyperIQA:
    @pytest.fixture(scope="class")
    def synth(self):
        from facet_tpu.models.convert import synthetic_hyperiqa_state_dict

        return synthetic_hyperiqa_state_dict(np.random.default_rng(3))

    def test_synthetic_dict_loads_torch_replica_strict(self, synth):
        net = TorchHyperNet()
        missing, unexpected = net.load_state_dict(
            {k: torch.tensor(v) for k, v in synth.items()}, strict=False)
        # strict modulo BN bookkeeping counters the synthetic dict omits
        assert not unexpected
        assert all("num_batches_tracked" in k for k in missing), missing

    def test_converter_consumes_everything(self, synth):
        from facet_tpu.models.convert import convert_hyperiqa

        tree, unmapped = convert_hyperiqa(synth)
        assert unmapped == []

    def test_converted_tree_matches_init_structure(self, synth):
        import jax
        import jax.numpy as jnp

        from facet_tpu.models.convert import convert_hyperiqa, flatten_tree
        from facet_tpu.models.iqa_extra import HyperIQANet

        tree, _ = convert_hyperiqa(synth)
        init = HyperIQANet().init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 224, 224, 3), jnp.float32))
        init_flat = flatten_tree(jax.tree.map(np.asarray, init))
        conv_flat = flatten_tree(tree)
        assert set(conv_flat) == set(init_flat)
        for key in conv_flat:
            assert conv_flat[key].shape == init_flat[key].shape, key

    def test_forward_parity_torch_vs_flax(self, synth):
        import jax.numpy as jnp

        from facet_tpu.models.convert import convert_hyperiqa
        from facet_tpu.models.iqa_extra import HyperIQANet

        net = TorchHyperNet().eval()
        net.load_state_dict({k: torch.tensor(v) for k, v in synth.items()},
                            strict=False)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 224, 224, 3)).astype(np.float32) * 0.5
        with torch.no_grad():
            want = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
        tree, _ = convert_hyperiqa(synth)
        got = np.asarray(HyperIQANet().apply(tree, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


class TestDBCNN:
    @pytest.fixture(scope="class")
    def synth(self):
        from facet_tpu.models.convert import synthetic_dbcnn_state_dict

        return synthetic_dbcnn_state_dict(np.random.default_rng(4))

    def test_synthetic_dict_loads_torch_replica_strict(self, synth):
        net = TorchDBCNN()
        missing, unexpected = net.load_state_dict(
            {k: torch.tensor(v) for k, v in synth.items()}, strict=False)
        assert not unexpected
        assert all("num_batches_tracked" in k for k in missing), missing

    def test_converter_consumes_everything(self, synth):
        from facet_tpu.models.convert import convert_dbcnn

        tree, unmapped = convert_dbcnn(synth)
        assert unmapped == []

    def test_converted_tree_matches_init_structure(self, synth):
        import jax
        import jax.numpy as jnp

        from facet_tpu.models.convert import convert_dbcnn, flatten_tree
        from facet_tpu.models.iqa_extra import DBCNNNet

        tree, _ = convert_dbcnn(synth)
        init = DBCNNNet().init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 96, 96, 3), jnp.float32))
        init_flat = flatten_tree(jax.tree.map(np.asarray, init))
        conv_flat = flatten_tree(tree)
        assert set(conv_flat) == set(init_flat)
        for key in conv_flat:
            assert conv_flat[key].shape == init_flat[key].shape, key

    def test_forward_parity_torch_vs_flax(self, synth):
        import jax.numpy as jnp

        from facet_tpu.models.convert import convert_dbcnn
        from facet_tpu.models.iqa_extra import DBCNNNet

        net = TorchDBCNN().eval()
        net.load_state_dict({k: torch.tensor(v) for k, v in synth.items()},
                            strict=False)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32) * 0.5
        with torch.no_grad():
            want = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
        tree, _ = convert_dbcnn(synth)
        got = np.asarray(DBCNNNet().apply(tree, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
