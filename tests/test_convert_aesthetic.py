"""Aesthetic head: the REAL improved-aesthetic-predictor checkpoint.

The reference's own code downloads sac+logos+ava1-l14-linearMSE.pth
(processing/scorer.py:573-577) — the improved-aesthetic-predictor MLP
(Linear(768,1024) -> Dropout -> Linear(1024,128) -> Dropout ->
Linear(128,64) -> Dropout -> Linear(64,16) -> Linear(16,1), keys
``layers.{0,2,4,6,7}.*``) — then loads it strict=False into a mismatched
Sequential(Linear(768,256), ReLU, Linear(256,1)) (scorer.py:579-585), so
ZERO of its keys match and the reference's aesthetic head silently stays
random-init. Our converter recognizes the real vocabulary, collapses the
purely-affine stack exactly into the fc1/relu/fc2 structure
(relu(z) - relu(-z) = z) with normalize-input semantics, and rescales so
the engine's unchanged clip((raw+1)*5) formula reproduces the predictor's
own 0-10 score. These tests pin that against a torch replica of the
published MLP class.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn


def real_mlp():
    """The published improved-aesthetic-predictor MLP (inference part)."""

    class MLP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.layers = tnn.Sequential(
                tnn.Linear(768, 1024), tnn.Dropout(0.2),
                tnn.Linear(1024, 128), tnn.Dropout(0.2),
                tnn.Linear(128, 64), tnn.Dropout(0.1),
                tnn.Linear(64, 16), tnn.Linear(16, 1))

        def forward(self, x):
            return self.layers(x)

    return MLP()


@pytest.fixture(scope="module")
def synth():
    rng = np.random.default_rng(11)
    sd = {}
    for i, (dout, din) in zip((0, 2, 4, 6, 7),
                              ((1024, 768), (128, 1024), (64, 128),
                               (16, 64), (1, 16))):
        sd[f"layers.{i}.weight"] = rng.standard_normal(
            (dout, din)).astype(np.float32) / np.sqrt(din)
        sd[f"layers.{i}.bias"] = rng.standard_normal(dout).astype(
            np.float32) * 0.05
    return sd


def test_synthetic_dict_loads_torch_replica_strict(synth):
    net = real_mlp()
    net.load_state_dict({k: torch.tensor(v) for k, v in synth.items()},
                        strict=True)


def test_converted_tree_matches_head_structure(synth):
    import jax

    from facet_tpu.models.aesthetic import AestheticHead
    from facet_tpu.models.convert import convert_aesthetic_head, flatten_tree

    tree = convert_aesthetic_head(synth)
    assert np.asarray(tree["meta"]["normalize_input"]) == 1.0
    init = AestheticHead().init(jax.random.PRNGKey(0),
                                np.zeros((1, 768), np.float32))
    assert set(flatten_tree(tree["params"])) == set(
        flatten_tree(jax.tree.map(np.asarray, init["params"])))


def test_engine_formula_reproduces_predictor_score(synth):
    """clip((head(f) + 1) * 5) on UNNORMALIZED features == the published
    predictor's own score on the normalized embedding."""
    import jax.numpy as jnp

    from facet_tpu.models.aesthetic import head_module_for
    from facet_tpu.models.convert import convert_aesthetic_head

    net = real_mlp().eval()
    net.load_state_dict({k: torch.tensor(v) for k, v in synth.items()},
                        strict=True)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((8, 768)).astype(np.float32) * 7.0
    normalized = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    with torch.no_grad():
        want = np.clip(net(torch.tensor(normalized)).numpy()[:, 0], 0, 10)

    tree = convert_aesthetic_head(synth)
    head = head_module_for(tree)
    assert head.normalize_input
    raw = np.asarray(head.apply(tree, jnp.asarray(feats)))[:, 0]
    got = np.clip((raw + 1.0) * 5.0, 0.0, 10.0)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_recompute_path_agrees_with_fused_path(synth):
    """With the real head, scoring the stored normalized embedding gives
    the same score as the fused path (normalization is idempotent) — the
    reference's recompute quirk vanishes."""
    from facet_tpu.models.aesthetic import AestheticScorer
    from facet_tpu.models.clip import CLIPVisionConfig
    from facet_tpu.models.convert import convert_aesthetic_head

    tiny = CLIPVisionConfig(image_size=28, patch_size=14, width=64,
                            layers=2, heads=4, projection_dim=768)
    scorer = AestheticScorer(head_params=convert_aesthetic_head(synth),
                             config=tiny)
    assert scorer.head.normalize_input
    rng = np.random.default_rng(2)
    images = [rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
              for _ in range(3)]
    results = scorer.score_batch(images)
    for score, emb_bytes in results:
        again = scorer.score_from_embedding(emb_bytes)
        assert abs(score - again) < 1e-4, (score, again)


def test_declared_sequential_vocabulary_still_maps():
    """The reference's declared 0./2. Sequential converts as before, with
    no meta collection (reference-parity formula on unnormalized input)."""
    from facet_tpu.models.aesthetic import head_module_for
    from facet_tpu.models.convert import convert_aesthetic_head

    rng = np.random.default_rng(3)
    sd = {"0.weight": rng.standard_normal((256, 768)).astype(np.float32),
          "0.bias": np.zeros(256, np.float32),
          "2.weight": rng.standard_normal((1, 256)).astype(np.float32),
          "2.bias": np.zeros(1, np.float32)}
    tree = convert_aesthetic_head(sd)
    assert "meta" not in tree
    assert not head_module_for(tree).normalize_input
    np.testing.assert_array_equal(tree["params"]["fc1"]["kernel"],
                                  sd["0.weight"].T)
