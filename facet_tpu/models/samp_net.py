"""SAMP-Net composition assessment in flax (NHWC).

Saliency-Augmented Multi-pattern Pooling (public: Zhang et al., CADB/SAMPNet)
— the reference drives the torch original through models/samp_net.py:665-1043.
Pipeline: 224x224 ImageNet-normalized image -> ResNet-18 features (7x7x512)
-> pattern-weight head -> 8 spatial pooling patterns over features + U2-Net-P
saliency (checkpoint-exact assembled channel shapes 1296/1373/1324/836 with
pad-to-fit) -> softmax-weighted 1024-d aggregate -> 6 sigmoid attributes +
5-class score distribution. Expected score over {1..5} rescales to 0-10;
dominant pattern is the argmax pattern weight.
"""

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

COMPOSITION_PATTERNS = [
    "global", "horizontal", "vertical", "triangular",
    "surround", "quarter", "cross", "rule_of_thirds",
]

# checkpoint-exact assembled conv input shapes per pattern
PATTERN_SHAPES = [(1296, 2, 1), (1296, 1, 2), (1373, 2, 1), (1373, 2, 1),
                  (1296, 2, 1), (1296, 2, 2), (1324, 2, 2), (836, 3, 3)]
PATTERN_KERNELS = [(2, 1), (1, 2), (2, 1), (2, 1), (2, 1), (2, 2), (2, 2), (3, 3)]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------- backbone


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=True)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=True)(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=True, name="down_bn")(x)
        return nn.relu(x + y)


class ResNet18Features(nn.Module):
    """224x224x3 -> 7x7x512 feature map (torchvision resnet18 children[:-2])."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for stage, (feats, stride) in enumerate(((64, 1), (128, 2), (256, 2), (512, 2))):
            x = BasicBlock(feats, stride, name=f"layer{stage + 1}_0")(x)
            x = BasicBlock(feats, 1, name=f"layer{stage + 1}_1")(x)
        return x


# ------------------------------------------------------------ pooling utils


def _adaptive_pool(x, out_h, out_w, mode="avg"):
    """torch adaptive pooling semantics on NHWC (static small outputs)."""
    h, w = x.shape[1], x.shape[2]
    rows = []
    for i in range(out_h):
        h0, h1 = (i * h) // out_h, -(-((i + 1) * h) // out_h)
        cols = []
        for j in range(out_w):
            w0, w1 = (j * w) // out_w, -(-((j + 1) * w) // out_w)
            region = x[:, h0:h1, w0:w1, :]
            if mode == "avg":
                cols.append(region.mean(axis=(1, 2)))
            else:
                cols.append(region.max(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, out_h, out_w, C)


def _maxpool_k3s2p1(x):
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _gmax(x):
    return x.max(axis=(1, 2))


def _gavg(x):
    return x.mean(axis=(1, 2))


def _fit(feat, total, pad_source):
    """Pad (tiling pad_source) or truncate to the checkpoint's exact width."""
    cur = feat.shape[1]
    if cur < total:
        need = total - cur
        reps = -(-need // pad_source.shape[1])
        pad = jnp.tile(pad_source, (1, reps))[:, :need]
        feat = jnp.concatenate([feat, pad], axis=1)
    elif cur > total:
        feat = feat[:, :total]
    return feat


# ----------------------------------------------------------------- SAMP-Net


class SAMPNet(nn.Module):
    """(image 224x224x3 normalized, saliency 224x224x1) ->
    (pattern_weights (B,8), attributes (B,6), score_dist (B,5))."""

    num_patterns: int = 8

    @nn.compact
    def __call__(self, image, saliency, deterministic=True):
        fmap = ResNet18Features(name="backbone")(image)       # (B, 7, 7, 512)
        b, h, w, c = fmap.shape

        pattern_weights = nn.Dense(self.num_patterns, use_bias=False,
                                   name="pattern_weight")(nn.relu(_gavg(fmap)))

        sal = _maxpool_k3s2p1(_maxpool_k3s2p1(saliency))       # ~56x56
        sal = jax.image.resize(sal, (b, h, w, 1), "bilinear")  # match fmap

        global_max = _gmax(fmap)
        global_avg = _gavg(fmap)
        sal_small = _adaptive_pool(sal, 4, 4, "avg").reshape(b, -1)   # 16

        halves_h = (fmap[:, : h // 2], fmap[:, h // 2:])
        halves_w = (fmap[:, :, : w // 2], fmap[:, :, w // 2:])
        center = fmap[:, h // 4: h - h // 4, w // 4: w - w // 4]

        def two_region(r1, r2):
            return jnp.concatenate(
                [_gmax(r1), _gavg(r1), _gmax(r2), _gavg(r2), sal_small], axis=1)

        assembled = []
        # 0 horizontal halves / 1 vertical halves / 4 center-vs-all
        assembled.append(two_region(*halves_h))
        assembled.append(two_region(*halves_w))
        diag = jnp.concatenate(
            [_gmax(halves_h[0]), _gavg(halves_h[0]), _gmax(halves_h[1]),
             _gavg(halves_h[1]), _gmax(center), sal_small], axis=1)
        assembled.insert(2, diag)          # pattern 2
        assembled.insert(3, diag)          # pattern 3 (same assembly)
        assembled.append(two_region(center, fmap))  # pattern 4

        quads = [fmap[:, : h // 2, : w // 2], fmap[:, : h // 2, w // 2:],
                 fmap[:, h // 2:, : w // 2], fmap[:, h // 2:, w // 2:]]
        assembled.append(jnp.concatenate(
            [_gmax(q) for q in quads] + [_gavg(q) for q in quads]
            + [_gmax(center), sal_small], axis=1))               # pattern 5

        h3, w3 = h // 3, w // 3
        grid = []
        for i in range(3):
            for j in range(3):
                r = fmap[:, i * h3: min(h, (i + 1) * h3),
                         j * w3: min(w, (j + 1) * w3)]
                grid.append(_gmax(r))
        assembled.append(jnp.concatenate(grid + [sal_small], axis=1))  # pattern 6

        sal_large = _adaptive_pool(sal, 8, 8, "avg").reshape(b, -1)    # 64
        scales = [_adaptive_pool(fmap, s, s, "avg").reshape(b, -1) for s in (2, 3, 4)]
        weighted = _gavg(fmap * sal)
        assembled.append(jnp.concatenate(
            [global_max, global_avg] + scales + [weighted, sal_large], axis=1))  # 7

        pattern_feats = []
        for idx in range(self.num_patterns):
            ch, ph, pw = PATTERN_SHAPES[idx]
            feat = _fit(assembled[idx], ch * ph * pw, global_max)
            # channel-major layout, matching torch's view(B, C, H, W)
            spatial = feat.reshape(b, ch, ph, pw).transpose(0, 2, 3, 1)
            conv = nn.Conv(1024, PATTERN_KERNELS[idx], padding="VALID",
                           use_bias=False, name=f"pattern_conv{idx}")(spatial)
            pattern_feats.append(conv.reshape(b, -1))
        pattern_feats = jnp.stack(pattern_feats, axis=1)         # (B, 8, 1024)

        weights = jax.nn.softmax(pattern_weights, axis=1)[:, :, None]
        aggregated = jnp.sum(pattern_feats * weights, axis=1)    # (B, 1024)

        att = nn.relu(nn.Dense(512, use_bias=False, name="att_feature")(aggregated))
        attributes = jax.nn.sigmoid(
            nn.Dense(6, use_bias=False, name="att_pred")(att))

        s = nn.relu(nn.Dense(1024, use_bias=False, name="com_pred0")(aggregated))
        s = nn.relu(nn.Dense(512, use_bias=False, name="com_pred3")(s))
        score_dist = jax.nn.softmax(
            nn.Dense(5, use_bias=False, name="com_pred5")(s), axis=1)
        return pattern_weights, attributes, score_dist


# -------------------------------------------------------------- scorer API


@dataclass
class SAMPComposition:
    """Batched composition scorer: images -> score dicts."""

    samp_params: dict
    u2_params: dict

    def __post_init__(self):
        from facet_tpu.models.u2netp import U2NETP
        from facet_tpu.processing.device_pipeline import default_mesh

        self._samp = SAMPNet()
        self._u2 = U2NETP()
        self._forward = jax.jit(self._forward_impl)
        self._programs = {}
        self._placed = None
        self._mesh = default_mesh()

    def _program(self, h, w):
        """Device resize to 224 + saliency + heads in ONE program per
        source shape (shardable over the dp mesh)."""
        key = (h, w)
        if key not in self._programs:
            from facet_tpu.ops.resize import resample_matrix

            rows = jnp.asarray(resample_matrix(h, 224, method="linear"))
            cols = jnp.asarray(resample_matrix(w, 224, method="linear"))

            @jax.jit
            def run(samp_params, u2_params, batch_u8):
                x = batch_u8.astype(jnp.float32)
                x = jnp.einsum("rh,bhwc->brwc", rows, x)
                x = jnp.einsum("sw,brwc->brsc", cols, x)
                return self._forward_impl(samp_params, u2_params, x)

            self._programs[key] = run
        return self._programs[key]

    def _run(self, h, w, batch):
        if self._mesh is None:
            return jax.device_get(self._program(h, w)(
                self.samp_params, self.u2_params, jnp.asarray(batch)))
        from facet_tpu.parallel.mesh import replicated_sharding, shard_batch

        if self._placed is None:
            sharding = replicated_sharding(self._mesh)
            self._placed = (jax.device_put(self.samp_params, sharding),
                            jax.device_put(self.u2_params, sharding))
        sharded, _ = shard_batch(batch, self._mesh)
        return jax.device_get(self._program(h, w)(*self._placed, sharded))

    @classmethod
    def create(cls, config=None, cached=None):
        from facet_tpu.models.checkpoints import load_or_none, _warn_once

        if cached is not None:
            return cls(cached["samp"], cached["u2"])
        from facet_tpu.models.u2netp import U2NETP

        samp = load_or_none("samp_net")
        u2 = load_or_none("u2netp")
        from facet_tpu.models.checkpoints import fallback_init, sds

        if samp is None:
            _warn_once("samp_net")
            samp = fallback_init(SAMPNet(), sds((1, 224, 224, 3)),
                                 sds((1, 224, 224, 1)), seed=20)
        if u2 is None:
            _warn_once("u2netp")
            u2 = fallback_init(U2NETP(), sds((1, 224, 224, 3)), seed=21)
        return cls(samp, u2)

    def host_params(self):
        to_host = lambda t: jax.tree.map(np.asarray, t)
        return {"samp": to_host(self.samp_params), "u2": to_host(self.u2_params)}

    def _forward_impl(self, samp_params, u2_params, pixels):
        """pixels: (B, 224, 224, 3) float32 in [0, 255]."""
        x = pixels / 255.0
        norm = (x - IMAGENET_MEAN) / IMAGENET_STD
        saliency = self._u2.apply(u2_params, norm)
        return self._samp.apply(samp_params, norm, saliency)

    def rider(self, h, w):
        """(run, finish) for joint dispatch on a resident device batch —
        the SAMP+U2NetP program rides the fused clip pass's buffer when
        bin-packed into the same group (processing/device_pipeline.py
        score_images), saving one full-batch host->device transfer."""
        prog = self._program(h, w)
        if self._mesh is None:
            params = (self.samp_params, self.u2_params)
        else:
            from facet_tpu.parallel.mesh import replicated_sharding

            if self._placed is None:
                sharding = replicated_sharding(self._mesh)
                self._placed = (jax.device_put(self.samp_params, sharding),
                                jax.device_put(self.u2_params, sharding))
            params = self._placed

        def run(dev):
            return prog(*params, dev)

        def finish(fetched, n):
            pw_o, at_o, di_o = fetched
            return self._to_results(np.asarray(pw_o)[:n],
                                    np.asarray(at_o)[:n],
                                    np.asarray(di_o)[:n])

        return run, finish

    def score_batch(self, images):
        """RGB uint8 arrays (any sizes) -> list of score dicts. One device
        call per source shape, batch-sharded over the chip mesh."""
        if not images:
            return []
        n = len(images)
        pw = np.empty((n, 8), np.float32)
        attrs = np.empty((n, 6), np.float32)
        dist = np.empty((n, 5), np.float32)
        by_shape = {}
        for i, img in enumerate(images):
            by_shape.setdefault(img.shape[:2], []).append(i)
        for (h, w), idxs in by_shape.items():
            batch = np.stack([images[i] for i in idxs])
            pw_o, at_o, di_o = self._run(h, w, batch)
            pw[idxs] = np.asarray(pw_o)[:len(idxs)]
            attrs[idxs] = np.asarray(at_o)[:len(idxs)]
            dist[idxs] = np.asarray(di_o)[:len(idxs)]
        return self._to_results(pw, attrs, dist)

    def _to_results(self, pw, attrs, dist):
        """Raw head outputs -> engine score dicts (shared by score_batch
        and the joint-dispatch rider)."""
        results = []
        for i in range(len(pw)):
            weights = np.exp(pw[i] - pw[i].max())
            weights = weights / weights.sum()
            raw = float(np.sum(np.arange(1, 6) * dist[i]))
            score = max(0.0, min(10.0, (raw - 1) / 4.0 * 10.0))
            dominant = int(np.argmax(weights))
            results.append({
                "score": round(score, 2),
                "raw_score": round(raw, 2),
                "pattern": COMPOSITION_PATTERNS[dominant],
                "pattern_index": dominant,
                "pattern_weights": {COMPOSITION_PATTERNS[j]: float(weights[j])
                                    for j in range(len(COMPOSITION_PATTERNS))},
                "score_distribution": dist[i].tolist(),
                "attributes": attrs[i].tolist(),
                "power_point_score": round(score / 2, 2),
            })
        return results
