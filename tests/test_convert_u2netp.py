"""U2-Net-P: published-format state dict loads an independent torch
transcription with strict=True AND the converted flax module matches that
torch forward numerically.

The torch modules below transcribe the PUBLISHED u2net.py
(xuebinqin/U-2-Net — REBNCONV, RSU7..RSU4, RSU4F, U2NETP(3,1); the exact
file u2netp.pth was trained with): ceil-mode 2x2 max pools, dilated
bottoms, `_upsample_like` bilinear (align_corners=False), side outputs
fused by a 1x1 conv. Written independently of facet_tpu/models/u2netp.py
(HyperIQA/DBCNN/MUSIQ pattern), so agreement pins the architecture, the
converter key map (tools/convert_checkpoints.py convert_u2netp), AND the
flax module's pool/upsample numerics — including ceil-mode pooling and
non-integer bilinear upsampling on non-32-multiple inputs.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


class REBNCONV(tnn.Module):
    def __init__(self, in_ch, out_ch, dirate=1):
        super().__init__()
        self.conv_s1 = tnn.Conv2d(in_ch, out_ch, 3, padding=dirate,
                                  dilation=dirate)
        self.bn_s1 = tnn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn_s1(self.conv_s1(x)))


def upsample_like(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear")


class TorchRSU(tnn.Module):
    """RSU7..RSU4 (published u2net.py, parametric over depth)."""

    def __init__(self, depth, in_ch, mid_ch, out_ch):
        super().__init__()
        self.depth = depth
        self.rebnconvin = REBNCONV(in_ch, out_ch)
        self.rebnconv1 = REBNCONV(out_ch, mid_ch)
        for i in range(2, depth):
            setattr(self, f"rebnconv{i}", REBNCONV(mid_ch, mid_ch))
        setattr(self, f"rebnconv{depth}", REBNCONV(mid_ch, mid_ch, dirate=2))
        for i in range(depth - 1, 1, -1):
            setattr(self, f"rebnconv{i}d", REBNCONV(mid_ch * 2, mid_ch))
        self.rebnconv1d = REBNCONV(mid_ch * 2, out_ch)
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        encs = [self.rebnconv1(hxin)]
        for i in range(2, self.depth):
            encs.append(getattr(self, f"rebnconv{i}")(self.pool(encs[-1])))
        h = getattr(self, f"rebnconv{self.depth}")(encs[-1])
        for i in range(self.depth - 1, 0, -1):
            skip = encs[i - 1]
            if h.shape[2:] != skip.shape[2:]:
                h = upsample_like(h, skip)
            h = getattr(self, f"rebnconv{i}d")(torch.cat((h, skip), 1))
        return h + hxin


class TorchRSU4F(tnn.Module):
    def __init__(self, in_ch, mid_ch, out_ch):
        super().__init__()
        self.rebnconvin = REBNCONV(in_ch, out_ch)
        self.rebnconv1 = REBNCONV(out_ch, mid_ch, 1)
        self.rebnconv2 = REBNCONV(mid_ch, mid_ch, 2)
        self.rebnconv3 = REBNCONV(mid_ch, mid_ch, 4)
        self.rebnconv4 = REBNCONV(mid_ch, mid_ch, 8)
        self.rebnconv3d = REBNCONV(mid_ch * 2, mid_ch, 4)
        self.rebnconv2d = REBNCONV(mid_ch * 2, mid_ch, 2)
        self.rebnconv1d = REBNCONV(mid_ch * 2, out_ch, 1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        hx1 = self.rebnconv1(hxin)
        hx2 = self.rebnconv2(hx1)
        hx3 = self.rebnconv3(hx2)
        hx4 = self.rebnconv4(hx3)
        hx3d = self.rebnconv3d(torch.cat((hx4, hx3), 1))
        hx2d = self.rebnconv2d(torch.cat((hx3d, hx2), 1))
        return self.rebnconv1d(torch.cat((hx2d, hx1), 1)) + hxin


class TorchU2NETP(tnn.Module):
    def __init__(self, in_ch=3, out_ch=1):
        super().__init__()
        self.stage1 = TorchRSU(7, in_ch, 16, 64)
        self.stage2 = TorchRSU(6, 64, 16, 64)
        self.stage3 = TorchRSU(5, 64, 16, 64)
        self.stage4 = TorchRSU(4, 64, 16, 64)
        self.stage5 = TorchRSU4F(64, 16, 64)
        self.stage6 = TorchRSU4F(64, 16, 64)
        self.stage5d = TorchRSU4F(128, 16, 64)
        self.stage4d = TorchRSU(4, 128, 16, 64)
        self.stage3d = TorchRSU(5, 128, 16, 64)
        self.stage2d = TorchRSU(6, 128, 16, 64)
        self.stage1d = TorchRSU(7, 128, 16, 64)
        for i in range(1, 7):
            setattr(self, f"side{i}", tnn.Conv2d(64, out_ch, 3, padding=1))
        self.outconv = tnn.Conv2d(6 * out_ch, out_ch, 1)
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        hx1 = self.stage1(x)
        hx2 = self.stage2(self.pool(hx1))
        hx3 = self.stage3(self.pool(hx2))
        hx4 = self.stage4(self.pool(hx3))
        hx5 = self.stage5(self.pool(hx4))
        hx6 = self.stage6(self.pool(hx5))
        hx5d = self.stage5d(torch.cat((upsample_like(hx6, hx5), hx5), 1))
        hx4d = self.stage4d(torch.cat((upsample_like(hx5d, hx4), hx4), 1))
        hx3d = self.stage3d(torch.cat((upsample_like(hx4d, hx3), hx3), 1))
        hx2d = self.stage2d(torch.cat((upsample_like(hx3d, hx2), hx2), 1))
        hx1d = self.stage1d(torch.cat((upsample_like(hx2d, hx1), hx1), 1))
        d1 = self.side1(hx1d)
        sides = [d1] + [upsample_like(getattr(self, f"side{i}")(h), d1)
                        for i, h in ((2, hx2d), (3, hx3d), (4, hx4d),
                                     (5, hx5d), (6, hx6))]
        return torch.sigmoid(self.outconv(torch.cat(sides, 1)))


@pytest.fixture(scope="module")
def synth():
    """Published-layout dict with RANDOMIZED BN affine + running stats and
    conv biases (the drill generator's identity BN would mask BN-folding
    errors in a parity test)."""
    from facet_tpu.models.convert import synthetic_u2netp_state_dict

    rng = np.random.default_rng(21)
    sd = synthetic_u2netp_state_dict(rng)
    for key in sd:
        if key.endswith(".conv_s1.bias") or key.endswith("bn_s1.bias"):
            sd[key] = rng.standard_normal(sd[key].shape).astype(
                np.float32) * 0.05
        elif key.endswith("bn_s1.weight"):
            sd[key] = rng.uniform(0.5, 1.5, sd[key].shape).astype(np.float32)
        elif key.endswith("bn_s1.running_mean"):
            sd[key] = rng.standard_normal(sd[key].shape).astype(
                np.float32) * 0.1
        elif key.endswith("bn_s1.running_var"):
            sd[key] = rng.uniform(0.5, 1.5, sd[key].shape).astype(np.float32)
    return sd


def _converted_tree(synth, tmp_path):
    import convert_checkpoints as cc

    from facet_tpu.models.convert import load_params

    torch.save({k: torch.tensor(v) for k, v in synth.items()},
               tmp_path / "u2netp.pth")
    assert cc.convert_u2netp(str(tmp_path), str(tmp_path))
    return load_params(str(tmp_path / "u2netp.npz"))


def test_synthetic_dict_loads_torch_replica_strict(synth):
    net = TorchU2NETP()
    missing, unexpected = net.load_state_dict(
        {k: torch.tensor(v) for k, v in synth.items()}, strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in k for k in missing), missing[:5]


def test_forward_parity_torch_vs_flax(synth, tmp_path):
    import jax.numpy as jnp

    from facet_tpu.models.u2netp import U2NETP

    net = TorchU2NETP().eval()
    net.load_state_dict({k: torch.tensor(v) for k, v in synth.items()},
                        strict=False)
    tree = _converted_tree(synth, tmp_path)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()[:, 0]
    got = np.asarray(U2NETP().apply(tree, jnp.asarray(x)))[..., 0]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_forward_parity_non_multiple_size(synth, tmp_path):
    """70x90 input: ceil-mode pools produce odd sizes at every level and
    the decoder's bilinear upsamples run at non-integer scales — the
    half-pixel grids must agree between torch and XLA."""
    import jax.numpy as jnp

    from facet_tpu.models.u2netp import U2NETP

    net = TorchU2NETP().eval()
    net.load_state_dict({k: torch.tensor(v) for k, v in synth.items()},
                        strict=False)
    tree = _converted_tree(synth, tmp_path)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 70, 90, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()[:, 0]
    got = np.asarray(U2NETP().apply(tree, jnp.asarray(x)))[..., 0]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
