"""CLIP tower tests: architecture parity vs torch (HF CLIP), aesthetic
pipeline semantics, tagger behavior, mesh sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facet_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig,
    CLIPVisionTower,
)
from facet_tpu.models.convert import (
    convert_hf_clip_text,
    convert_hf_clip_vision,
    load_params,
    save_params,
)


SMALL_VISION = CLIPVisionConfig(image_size=28, patch_size=14, width=64,
                                layers=2, heads=4, projection_dim=32)
SMALL_TEXT = CLIPTextConfig(vocab_size=128, context_length=16, width=48,
                            layers=2, heads=4, projection_dim=32)


class TestTorchParity:
    """Convert a randomly-initialized HF torch CLIP and check our forward
    matches torch to float32 precision — validates the architecture mapping
    that real laion2b checkpoints will flow through."""

    @pytest.fixture(scope="class")
    def torch_vision(self):
        import torch
        from transformers import CLIPVisionConfig as HFVC, CLIPVisionModelWithProjection

        cfg = HFVC(image_size=28, patch_size=14, hidden_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   intermediate_size=256, projection_dim=32, hidden_act="gelu")
        torch.manual_seed(0)
        model = CLIPVisionModelWithProjection(cfg).eval()
        return model

    def test_vision_forward_matches(self, torch_vision):
        import torch

        params = convert_hf_clip_vision(torch_vision.state_dict(), layers=2)
        ours = CLIPVisionTower(SMALL_VISION, dtype=jnp.float32)

        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((3, 28, 28, 3)).astype(np.float32)
        got = np.asarray(ours.apply(jax.device_put(params), jnp.asarray(pixels)))

        with torch.no_grad():
            want = torch_vision(
                pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))
            ).image_embeds.numpy()
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_text_forward_matches(self):
        import torch
        from transformers import CLIPTextConfig as HFTC, CLIPTextModelWithProjection

        cfg = HFTC(vocab_size=128, max_position_embeddings=16, hidden_size=48,
                   num_hidden_layers=2, num_attention_heads=4,
                   intermediate_size=192, projection_dim=32, hidden_act="gelu",
                   eos_token_id=127, bos_token_id=126)
        torch.manual_seed(1)
        model = CLIPTextModelWithProjection(cfg).eval()
        params = convert_hf_clip_text(model.state_dict(), layers=2)
        ours = CLIPTextTower(SMALL_TEXT, dtype=jnp.float32)

        # tokens end with the highest id (EOT=127) so both poolers agree
        ids = np.array([[126, 5, 9, 2, 127, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                        [126, 77, 3, 4, 18, 99, 127, 0, 0, 0, 0, 0, 0, 0, 0, 0]],
                       np.int32)
        got = np.asarray(ours.apply(jax.device_put(params), jnp.asarray(ids)))
        with torch.no_grad():
            want = model(input_ids=torch.tensor(ids.astype(np.int64))).text_embeds.numpy()
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


class TestParamsRoundtrip:
    def test_npz_save_load(self, tmp_path):
        model = CLIPVisionTower(SMALL_VISION, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 28, 28, 3), jnp.float32))
        path = str(tmp_path / "v.npz")
        save_params(jax.tree.map(np.asarray, params), path)
        loaded = load_params(path)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 28, 28, 3)),
                        jnp.float32)
        a = model.apply(params, x)
        b = model.apply(jax.device_put(loaded), x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestAestheticScorer:
    @pytest.fixture(scope="class")
    def scorer(self):
        from facet_tpu.models.aesthetic import AestheticScorer

        return AestheticScorer(config=SMALL_VISION, dtype=jnp.float32)

    def test_score_batch_contract(self, scorer):
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 256, (60, 90, 3), dtype=np.uint8) for _ in range(3)]
        out = scorer.score_batch(imgs)
        assert len(out) == 3
        for score, blob in out:
            assert 0.0 <= score <= 10.0
            emb = np.frombuffer(blob, np.float32)
            assert emb.shape == (SMALL_VISION.projection_dim,)
            assert np.linalg.norm(emb) == pytest.approx(1.0, abs=1e-5)

    def test_recompute_from_embedding(self, scorer):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (50, 50, 3), dtype=np.uint8)
        (_, blob), = scorer.score_batch([img])
        rescored = scorer.score_from_embedding(blob)
        assert 0.0 <= rescored <= 10.0
        batch = scorer.score_from_embeddings_batch(
            np.frombuffer(blob, np.float32).reshape(1, -1))
        assert batch[0] == pytest.approx(rescored, abs=1e-6)

    def test_preprocess_center_crop_shape(self, scorer):
        rng = np.random.default_rng(2)
        wide = rng.integers(0, 256, (100, 300, 3), dtype=np.uint8)
        tall = rng.integers(0, 256, (300, 100, 3), dtype=np.uint8)
        crops = scorer.preprocess([wide, tall])
        assert crops.shape == (2, 28, 28, 3)
        assert crops.min() >= -1 and crops.max() <= 256


class TestTagger:
    def test_threshold_and_topk(self, scoring_config):
        from facet_tpu.models.tagger import CLIPTagger

        tagger = CLIPTagger(scoring_config, embedding_dim=512)
        # craft an embedding aligned with the 'animal' tag's first prompt
        t = tagger.tags.index("animal")
        col = np.nonzero(tagger.segment_ids == t)[0][0]
        emb = tagger.prompt_matrix[:, col]
        results = tagger.tag_embeddings(emb[None])
        assert results[0][0][0] == "animal"
        assert results[0][0][1] == pytest.approx(1.0, abs=1e-5)
        assert len(results[0]) <= tagger.max_tags
        # embedding orthogonal to every prompt tags nothing (threshold 0.22)
        q, _ = np.linalg.qr(tagger.prompt_matrix)          # (512, P) orthonormal
        rng = np.random.default_rng(0)
        noise = rng.standard_normal(512).astype(np.float32)
        noise -= q @ (q.T @ noise)
        out = tagger.tag_embeddings((noise / np.linalg.norm(noise))[None])
        assert out[0] == []

    def test_artwork_gate(self, scoring_config):
        from facet_tpu.models.tagger import CLIPTagger

        tagger = CLIPTagger(scoring_config, embedding_dim=32)
        assert tagger.is_artwork([("painting", 0.5)])
        assert not tagger.is_artwork([("mountain", 0.5)])


class TestFlashAttention:
    """The pallas flash-attention wrapper (clip._flash_attention) must
    agree with the materialized-softmax einsum formula it replaces — this
    pins the wrapper's 128-multiple padding, segment-id masking of the
    padded keys, and layout transposes. Runs in pallas interpret mode on
    the CPU backend (the wrapper selects it automatically)."""

    def test_wrapper_matches_einsum(self):
        from facet_tpu.models.clip import _flash_attention

        b, s, h, d = 2, 37, 4, 32          # 37 forces padding to 128
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.standard_normal((b, s, h, d)),
                               jnp.float32) for _ in range(3))
        scale = d ** -0.5
        got = np.asarray(_flash_attention(q, k, v, scale))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        weights = jax.nn.softmax(logits, axis=-1)
        want = np.asarray(jnp.einsum("bhqk,bkhd->bqhd", weights, v))
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)

    def test_resolver_defaults(self, monkeypatch):
        from facet_tpu.models.clip import resolve_attn_impl

        monkeypatch.delenv("FACET_ATTN_IMPL", raising=False)
        assert resolve_attn_impl("auto") == "xla"   # measured winner (r4)
        assert resolve_attn_impl("flash") == "flash"
        monkeypatch.setenv("FACET_ATTN_IMPL", "flash")
        assert resolve_attn_impl("auto") == "flash"


class TestMeshSharding:
    def test_batch_shards_over_8_devices(self):
        from facet_tpu.parallel import get_mesh, shard_batch

        mesh = get_mesh()
        assert mesh.shape["dp"] == 8  # conftest forces 8 virtual cpu devices
        x = np.arange(20 * 3, dtype=np.float32).reshape(20, 3)
        sharded, n = shard_batch(x, mesh)
        assert n == 20
        assert sharded.shape == (24, 3)  # padded to multiple of 8
        assert len(sharded.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(sharded)[:20], x)

    def test_sharded_forward(self):
        """A jitted model forward over a dp-sharded batch runs on the mesh."""
        from facet_tpu.parallel import get_mesh, shard_batch

        model = CLIPVisionTower(SMALL_VISION, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 28, 28, 3), jnp.float32))
        mesh = get_mesh()
        batch = np.random.default_rng(0).standard_normal((16, 28, 28, 3)).astype(np.float32)
        sharded, n = shard_batch(batch, mesh)
        out = jax.jit(model.apply)(params, sharded)
        assert out.shape == (16, SMALL_VISION.projection_dim)
        # parity with unsharded execution
        ref = model.apply(params, jnp.asarray(batch))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestInt8Quant:
    """The w8a8 int8 tier (clip.Int8Dense): identical param tree to
    nn.Dense, bounded quantization error, env/config gating. The speed
    claim is measured on-chip (docs/PERF.md round 4); these tests pin the
    numerics and the drop-in contract."""

    def test_param_tree_identical_to_dense(self):
        import flax.linen as nn

        from facet_tpu.models.clip import Int8Dense

        x = jnp.zeros((3, 16), jnp.float32)
        pd = nn.Dense(8).init(jax.random.PRNGKey(0), x)
        pq = Int8Dense(8).init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(pd) == jax.tree.structure(pq)
        for a, b in zip(jax.tree.leaves(pd), jax.tree.leaves(pq)):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_matches_dense_within_quant_error(self):
        import flax.linen as nn

        from facet_tpu.models.clip import Int8Dense

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((5, 7, 64)) * 0.5, jnp.float32)
        d = nn.Dense(32, dtype=jnp.float32)
        params = d.init(jax.random.PRNGKey(1), x)
        want = np.asarray(d.apply(params, x))
        got = np.asarray(Int8Dense(32, dtype=jnp.float32).apply(params, x))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.03, rel

    def test_tower_int8_close_to_exact(self):
        from facet_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower

        cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=64,
                               layers=2, heads=2, projection_dim=16)
        tower = CLIPVisionTower(cfg, dtype=jnp.float32)
        params = tower.init(jax.random.PRNGKey(2), jnp.zeros((2, 28, 28, 3)))
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
        exact = np.asarray(tower.apply(params, img))
        q8 = np.asarray(tower.clone(quant="int8").apply(params, img))
        cos = float((exact * q8).sum()
                    / (np.linalg.norm(exact) * np.linalg.norm(q8)))
        assert cos > 0.99, cos

    def test_resolver_gates(self, monkeypatch):
        from facet_tpu.models.clip import resolve_quant_impl

        monkeypatch.delenv("FACET_CLIP_INT8", raising=False)
        assert resolve_quant_impl("auto") == "none"   # exact is the default
        assert resolve_quant_impl("int8") == "int8"
        monkeypatch.setenv("FACET_CLIP_INT8", "1")
        assert resolve_quant_impl("auto") == "int8"
        monkeypatch.setenv("FACET_CLIP_INT8", "0")
        assert resolve_quant_impl("auto") == "none"
