"""U2-Net-P saliency network in flax (NHWC).

Lightweight nested-U architecture (public: Qin et al., "U2-Net", 2020) used
to feed saliency maps into SAMP-Net (reference wrapper: models/samp_net.py:
258-342). Six RSU encoder stages, five decoder stages, six side outputs
fused by a 1x1 conv; all mid channels 16, stage width 64.

Inference-only: BatchNorm runs in inference mode with converted statistics.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBNRelu(nn.Module):
    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation))(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32)(x)
        return nn.relu(x)


def _down(x):
    """2x2 max pool, ceil mode like torch's MaxPool2d(2, stride=2, ceil_mode=True)."""
    h, w = x.shape[1], x.shape[2]
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _up_to(x, target):
    """Bilinear resize to target's spatial dims (align_corners=False)."""
    return jax.image.resize(
        x, (x.shape[0], target.shape[1], target.shape[2], x.shape[3]), "bilinear")


class RSU(nn.Module):
    """Residual U-block of configurable depth (RSU7..RSU4)."""

    depth: int          # 7 for RSU7 ... 4 for RSU4
    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        xin = ConvBNRelu(self.out, name="convin")(x)
        # encoder
        encs = []
        h = xin
        for d in range(self.depth - 1):
            h = ConvBNRelu(self.mid, name=f"enc{d}")(h)
            encs.append(h)
            if d < self.depth - 2:
                h = _down(h)
        bottom = ConvBNRelu(self.mid, dilation=2, name="bottom")(h)
        # decoder
        h = bottom
        for d in reversed(range(self.depth - 1)):
            skip = encs[d]
            if h.shape[1] != skip.shape[1] or h.shape[2] != skip.shape[2]:
                h = _up_to(h, skip)
            feats = self.out if d == 0 else self.mid
            h = ConvBNRelu(feats, name=f"dec{d}")(jnp.concatenate([h, skip], -1))
        return h + xin


class RSU4F(nn.Module):
    """Dilated variant: no pooling, dilation rates 1/2/4/8."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        xin = ConvBNRelu(self.out, name="convin")(x)
        h1 = ConvBNRelu(self.mid, dilation=1, name="enc0")(xin)
        h2 = ConvBNRelu(self.mid, dilation=2, name="enc1")(h1)
        h3 = ConvBNRelu(self.mid, dilation=4, name="enc2")(h2)
        h4 = ConvBNRelu(self.mid, dilation=8, name="bottom")(h3)
        d3 = ConvBNRelu(self.mid, dilation=4, name="dec2")(jnp.concatenate([h4, h3], -1))
        d2 = ConvBNRelu(self.mid, dilation=2, name="dec1")(jnp.concatenate([d3, h2], -1))
        d1 = ConvBNRelu(self.out, dilation=1, name="dec0")(jnp.concatenate([d2, h1], -1))
        return d1 + xin


class U2NETP(nn.Module):
    """(B, H, W, 3) normalized -> (B, H, W, 1) saliency in [0, 1]."""

    @nn.compact
    def __call__(self, x):
        e1 = RSU(7, 16, 64, name="stage1")(x)
        e2 = RSU(6, 16, 64, name="stage2")(_down(e1))
        e3 = RSU(5, 16, 64, name="stage3")(_down(e2))
        e4 = RSU(4, 16, 64, name="stage4")(_down(e3))
        e5 = RSU4F(16, 64, name="stage5")(_down(e4))
        e6 = RSU4F(16, 64, name="stage6")(_down(e5))

        d5 = RSU4F(16, 64, name="stage5d")(jnp.concatenate([_up_to(e6, e5), e5], -1))
        d4 = RSU(4, 16, 64, name="stage4d")(jnp.concatenate([_up_to(d5, e4), e4], -1))
        d3 = RSU(5, 16, 64, name="stage3d")(jnp.concatenate([_up_to(d4, e3), e3], -1))
        d2 = RSU(6, 16, 64, name="stage2d")(jnp.concatenate([_up_to(d3, e2), e2], -1))
        d1 = RSU(7, 16, 64, name="stage1d")(jnp.concatenate([_up_to(d2, e1), e1], -1))

        sides = []
        for stage, name in ((d1, "side1"), (d2, "side2"), (d3, "side3"),
                            (d4, "side4"), (d5, "side5"), (e6, "side6")):
            s = nn.Conv(1, (3, 3), padding=1, name=name)(stage)
            sides.append(_up_to(s, x) if s.shape[1] != x.shape[1] else s)
        fused = nn.Conv(1, (1, 1), name="outconv")(jnp.concatenate(sides, -1))
        return jax.nn.sigmoid(fused)
