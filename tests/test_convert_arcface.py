"""ArcFace iResNet-50 converter: key-map and numeric parity tests.

The torch model below is the published arcface_torch backbone
(insightface/recognition/arcface_torch/backbones/iresnet.py) — the network
buffalo_l's w600k_r50.onnx is exported from. Loading the synthetic state
dict with strict=True proves our converter's key vocabulary matches the real
checkpoint layout exactly; the forward comparison proves numeric parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class TorchIBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(inplanes, eps=1e-05)
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes, eps=1e-05)
        self.prelu = tnn.PReLU(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes, eps=1e-05)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.bn1(x)
        out = self.conv1(out)
        out = self.bn2(out)
        out = self.prelu(out)
        out = self.conv2(out)
        out = self.bn3(out)
        if self.downsample is not None:
            identity = self.downsample(x)
        return out + identity


class TorchIResNet(tnn.Module):
    fc_scale = 7 * 7

    def __init__(self, layers=(3, 4, 14, 3), num_features=512):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-05)
        self.prelu = tnn.PReLU(64)
        self.layer1 = self._make_layer(64, layers[0], stride=2)
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.bn2 = tnn.BatchNorm2d(512, eps=1e-05)
        self.dropout = tnn.Dropout(p=0.0)
        self.fc = tnn.Linear(512 * self.fc_scale, num_features)
        self.features = tnn.BatchNorm1d(num_features, eps=1e-05)

    def _make_layer(self, planes, blocks, stride):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
            tnn.BatchNorm2d(planes, eps=1e-05))
        layers = [TorchIBasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        for _ in range(1, blocks):
            layers.append(TorchIBasicBlock(self.inplanes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.conv1(x)
        x = self.bn1(x)
        x = self.prelu(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = self.bn2(x)
        x = torch.flatten(x, 1)
        x = self.dropout(x)
        x = self.fc(x)
        return self.features(x)


@pytest.fixture(scope="module")
def synthetic_sd():
    from facet_tpu.models.convert import synthetic_arcface_state_dict

    return synthetic_arcface_state_dict(np.random.default_rng(7))


class TestArcFaceConverter:
    def test_key_map_matches_published_layout(self, synthetic_sd):
        """strict=True load proves the synthetic dict (and therefore the
        converter's input vocabulary) IS the published checkpoint layout."""
        model = TorchIResNet()
        tensors = {k: torch.from_numpy(v) for k, v in synthetic_sd.items()}
        missing, unexpected = model.load_state_dict(tensors, strict=False)
        # torch tracks num_batches_tracked per BN; checkpoints may omit it
        assert all(k.endswith("num_batches_tracked") for k in missing), missing
        assert not unexpected, unexpected

    def test_converted_tree_matches_module_structure(self, synthetic_sd):
        import jax

        from facet_tpu.models.convert import convert_arcface_iresnet50
        from facet_tpu.models.face_models import IResNet

        converted = convert_arcface_iresnet50(synthetic_sd)
        import jax.numpy as jnp

        ref = IResNet().init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 112, 112, 3), jnp.float32))
        ref_shapes = jax.tree.map(lambda a: a.shape, ref)
        got_shapes = jax.tree.map(lambda a: a.shape, converted)
        assert ref_shapes == got_shapes

    def test_numeric_parity_with_torch(self, synthetic_sd):
        import jax.numpy as jnp

        from facet_tpu.models.convert import convert_arcface_iresnet50
        from facet_tpu.models.face_models import IResNet

        model = TorchIResNet().eval()
        model.load_state_dict(
            {k: torch.from_numpy(v) for k, v in synthetic_sd.items()},
            strict=False)
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 112, 112, 3)).astype(np.float32)
        with torch.no_grad():
            want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

        params = convert_arcface_iresnet50(synthetic_sd)
        got = np.asarray(IResNet().apply(params, jnp.asarray(x)))
        # raw activations reach O(1e3) with random BN stats; allow
        # cross-framework float32 accumulation noise
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=0.05)
        # production consumes L2-normalized embeddings: those must align
        gn = got / np.linalg.norm(got, axis=1, keepdims=True)
        wn = want / np.linalg.norm(want, axis=1, keepdims=True)
        cos = (gn * wn).sum(axis=1)
        assert np.all(cos > 0.999999), cos
