"""MUSIQ converter: the published checkpoint vocabulary loads an
independent torch transcription with strict=True AND the converted flax
module matches that torch forward numerically.

The torch module below is a transcription of the PUBLISHED architecture —
google-research/musiq as carried by pyiqa's `musiq_koniq_ckpt.pth` (the
reference's registry member, models/pyiqa_scorer.py:54-66): per-patch
BiT-style conv root (weight-standardized 7x7/2 conv -> GroupNorm(32) ->
ReLU -> 3x3/2 maxpool) + linear embedding, hash-based 10x10 spatial
buckets, per-scale scale embeddings, one pre-norm transformer over the
concatenated multi-scale tokens, CLS head. It is written here
independently of facet_tpu/models/musiq.py, so agreement pins both the
architecture transcription and the converter key map (the HyperIQA/DBCNN
pattern, tests/test_convert_iqa_extra.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional

# tiny-but-real dims: full 64-channel conv root (GroupNorm(32) pins it),
# 2 transformer layers, width 96 over the published 6 heads, 2 scales
LAYERS, HIDDEN, MLP, HEADS, GRID, SCALES = 2, 96, 192, 6, 10, 2


class TorchAttention(tnn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.heads = heads
        self.query = tnn.Linear(hidden, hidden)
        self.key = tnn.Linear(hidden, hidden)
        self.value = tnn.Linear(hidden, hidden)
        self.out = tnn.Linear(hidden, hidden)

    def forward(self, x):
        b, t, d = x.shape
        dh = d // self.heads
        shaped = lambda y: y.reshape(b, t, self.heads, dh).transpose(1, 2)
        q, k, v = shaped(self.query(x)), shaped(self.key(x)), shaped(
            self.value(x))
        a = torch.softmax(q @ k.transpose(-1, -2) / dh ** 0.5, -1)
        return self.out((a @ v).transpose(1, 2).reshape(b, t, d))


class TorchMLP(tnn.Module):
    def __init__(self, hidden, mlp_dim):
        super().__init__()
        self.fc1 = tnn.Linear(hidden, mlp_dim)
        self.fc2 = tnn.Linear(mlp_dim, hidden)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TorchBlock(tnn.Module):
    def __init__(self, hidden, mlp_dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(hidden, eps=1e-6)
        self.attn = TorchAttention(hidden, heads)
        self.norm2 = tnn.LayerNorm(hidden, eps=1e-6)
        self.mlp = TorchMLP(hidden, mlp_dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TorchTransformer(tnn.Module):
    def __init__(self, layers, hidden, mlp_dim, heads):
        super().__init__()
        self.blocks = tnn.ModuleList(
            [TorchBlock(hidden, mlp_dim, heads) for _ in range(layers)])
        self.norm = tnn.LayerNorm(hidden, eps=1e-6)


class TorchMUSIQ(tnn.Module):
    def __init__(self, layers=LAYERS, hidden=HIDDEN, mlp_dim=MLP,
                 heads=HEADS, grid=GRID, num_scales=SCALES):
        super().__init__()
        self.grid = grid
        self.conv_root = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.gn_root = tnn.GroupNorm(32, 64, eps=1e-5)
        self.embedding = tnn.Linear(64 * 8 * 8, hidden)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, hidden))
        self.pos_embedding = tnn.Parameter(torch.zeros(grid * grid, hidden))
        self.scale_embedding = tnn.Parameter(torch.zeros(num_scales, hidden))
        self.transformer = TorchTransformer(layers, hidden, mlp_dim, heads)
        self.head = tnn.Linear(hidden, 1)

    def forward(self, pyramid):
        """pyramid: list of (B, 3, H, W) in [-1, 1], 32-multiple dims."""
        toks = []
        for sidx, x in enumerate(pyramid):
            b, _, h, w = x.shape
            gh, gw = h // 32, w // 32
            p = x.reshape(b, 3, gh, 32, gw, 32).permute(0, 2, 4, 1, 3, 5)
            p = p.reshape(b * gh * gw, 3, 32, 32)
            wt = self.conv_root.weight
            mean = wt.mean(dim=(1, 2, 3), keepdim=True)
            var = wt.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
            wt = (wt - mean) / torch.sqrt(var + 1e-10)
            f = F.conv2d(p, wt, stride=2, padding=3)
            f = F.max_pool2d(F.relu(self.gn_root(f)), 3, 2, padding=1)
            emb = self.embedding(f.flatten(1)).reshape(b, gh * gw, -1)
            rows = torch.arange(gh) * self.grid // gh
            cols = torch.arange(gw) * self.grid // gw
            bucket = (rows[:, None] * self.grid + cols[None, :]).reshape(-1)
            toks.append(emb + self.pos_embedding[bucket][None]
                        + self.scale_embedding[sidx][None, None])
        x = torch.cat(toks, 1)
        x = torch.cat([self.cls_token.expand(x.shape[0], 1, -1), x], 1)
        for blk in self.transformer.blocks:
            x = blk(x)
        return self.head(self.transformer.norm(x[:, 0]))[:, 0]


def tiny_flax_config():
    from facet_tpu.models.musiq import MUSIQConfig

    return MUSIQConfig(hidden=HIDDEN, mlp_dim=MLP, layers=LAYERS,
                       heads=HEADS, longer_side_lengths=(64,))


@pytest.fixture(scope="module")
def synth():
    from facet_tpu.models.convert import synthetic_musiq_state_dict

    return synthetic_musiq_state_dict(
        np.random.default_rng(7), layers=LAYERS, hidden=HIDDEN,
        mlp_dim=MLP, grid=GRID, num_scales=SCALES)


def _pyramid(rng, batch=2):
    return [rng.standard_normal((batch, h, w, 3)).astype(np.float32) * 0.5
            for h, w in ((64, 96), (96, 128))]


def test_synthetic_dict_loads_torch_replica_strict(synth):
    net = TorchMUSIQ()
    net.load_state_dict({k: torch.tensor(v) for k, v in synth.items()},
                        strict=True)


def test_converter_consumes_everything(synth):
    from facet_tpu.models.convert import convert_musiq

    tree, unmapped = convert_musiq(synth, layers=LAYERS, heads=HEADS)
    assert unmapped == []


def test_converted_tree_matches_init_structure(synth):
    import jax

    from facet_tpu.models.convert import convert_musiq, flatten_tree
    from facet_tpu.models.musiq import MUSIQNet

    tree, _ = convert_musiq(synth, layers=LAYERS, heads=HEADS)
    cfg = tiny_flax_config()
    init = jax.eval_shape(
        lambda *xs: MUSIQNet(cfg).init(jax.random.PRNGKey(0), list(xs)),
        jax.ShapeDtypeStruct((1, 64, 96, 3), np.float32),
        jax.ShapeDtypeStruct((1, 96, 128, 3), np.float32))
    init_flat = flatten_tree(
        jax.tree.map(lambda s: np.empty(s.shape, s.dtype), init))
    conv_flat = flatten_tree(tree)
    assert set(conv_flat) == set(init_flat)
    for key in conv_flat:
        assert conv_flat[key].shape == init_flat[key].shape, key


def test_forward_parity_torch_vs_flax(synth):
    import jax.numpy as jnp

    from facet_tpu.models.convert import convert_musiq
    from facet_tpu.models.musiq import MUSIQNet

    net = TorchMUSIQ().eval()
    net.load_state_dict({k: torch.tensor(v) for k, v in synth.items()},
                        strict=True)
    rng = np.random.default_rng(0)
    pyramid = _pyramid(rng)
    with torch.no_grad():
        want = net([torch.tensor(x.transpose(0, 3, 1, 2))
                    for x in pyramid]).numpy()
    tree, _ = convert_musiq(synth, layers=LAYERS, heads=HEADS)
    got = np.asarray(MUSIQNet(tiny_flax_config()).apply(
        tree, [jnp.asarray(x) for x in pyramid]))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


def test_full_dims_structure(synth):
    """The converter at the PUBLISHED dims (14 layers, width 384, 3
    scales) produces exactly the default MUSIQNet tree (VERDICT r3 #4:
    converters drilled at real dims)."""
    import jax

    from facet_tpu.models.convert import (convert_musiq, flatten_tree,
                                          synthetic_musiq_state_dict)
    from facet_tpu.models.musiq import MUSIQConfig, MUSIQNet, scale_plan

    full = synthetic_musiq_state_dict(np.random.default_rng(8))
    tree, unmapped = convert_musiq(full)
    assert unmapped == []
    cfg = MUSIQConfig()
    dummy = [jax.ShapeDtypeStruct((1, ph, pw, 3), np.float32)
             for _, _, ph, pw in scale_plan(384, 512, cfg)]
    init = jax.eval_shape(
        lambda *xs: MUSIQNet(cfg).init(jax.random.PRNGKey(0), list(xs)),
        *dummy)
    init_flat = flatten_tree(
        jax.tree.map(lambda s: np.empty(s.shape, s.dtype), init))
    conv_flat = flatten_tree(tree)
    assert set(conv_flat) == set(init_flat)
    for key in conv_flat:
        assert conv_flat[key].shape == init_flat[key].shape, key


def test_fused_qkv_vocabulary_accepted():
    """timm-style exports fuse q/k/v; the converter maps that spelling to
    the same tree as the split vocabulary."""
    from facet_tpu.models.convert import (convert_musiq, flatten_tree,
                                          synthetic_musiq_state_dict)

    sd = synthetic_musiq_state_dict(np.random.default_rng(9), layers=1,
                                    hidden=HIDDEN, mlp_dim=MLP,
                                    num_scales=SCALES)
    split_tree, _ = convert_musiq(sd, layers=1, heads=HEADS)
    fused = dict(sd)
    bp = "transformer.blocks.0"
    fused[f"{bp}.attn.qkv.weight"] = np.concatenate(
        [fused.pop(f"{bp}.attn.{n}.weight")
         for n in ("query", "key", "value")], axis=0)
    fused[f"{bp}.attn.qkv.bias"] = np.concatenate(
        [fused.pop(f"{bp}.attn.{n}.bias")
         for n in ("query", "key", "value")], axis=0)
    fused[f"{bp}.attn.proj.weight"] = fused.pop(f"{bp}.attn.out.weight")
    fused[f"{bp}.attn.proj.bias"] = fused.pop(f"{bp}.attn.out.bias")
    fused_tree, unmapped = convert_musiq(fused, layers=1, heads=HEADS)
    assert unmapped == []
    a, b = flatten_tree(split_tree), flatten_tree(fused_tree)
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_array_equal(a[key], b[key])
