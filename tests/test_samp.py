"""SAMP-Net + U2-Net-P tests: shapes, invariants, engine integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestU2NetP:
    def test_saliency_output(self):
        from facet_tpu.models.u2netp import U2NETP

        model = U2NETP()
        x = jnp.zeros((1, 224, 224, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        rng = np.random.default_rng(0)
        out = model.apply(params, jnp.asarray(
            rng.standard_normal((2, 224, 224, 3)).astype(np.float32)))
        assert out.shape == (2, 224, 224, 1)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_odd_input_sizes(self):
        """ceil-mode pooling must survive non-power-of-two sizes."""
        from facet_tpu.models.u2netp import U2NETP

        model = U2NETP()
        x = jnp.zeros((1, 150, 198, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 150, 198, 1)


class TestSAMPNet:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        from facet_tpu.models.samp_net import SAMPNet

        model = SAMPNet()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), jnp.float32),
                            jnp.zeros((1, 224, 224, 1), jnp.float32))
        return model, params

    def test_output_contract(self, model_and_params):
        model, params = model_and_params
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.standard_normal((3, 224, 224, 3)).astype(np.float32))
        sal = jnp.asarray(rng.uniform(0, 1, (3, 224, 224, 1)).astype(np.float32))
        pw, attrs, dist = model.apply(params, img, sal)
        assert pw.shape == (3, 8)
        assert attrs.shape == (3, 6)
        assert dist.shape == (3, 5)
        np.testing.assert_allclose(np.asarray(dist).sum(axis=1), 1.0, atol=1e-5)
        assert float(attrs.min()) >= 0 and float(attrs.max()) <= 1

    def test_pattern_assembly_dims(self):
        """The checkpoint-exact channel shapes must hold (conv kernels)."""
        from facet_tpu.models.samp_net import PATTERN_SHAPES, PATTERN_KERNELS, SAMPNet

        model = SAMPNet()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), jnp.float32),
                            jnp.zeros((1, 224, 224, 1), jnp.float32))
        tree = params["params"]
        for idx, ((ch, _, _), kernel) in enumerate(zip(PATTERN_SHAPES, PATTERN_KERNELS)):
            k = tree[f"pattern_conv{idx}"]["kernel"]
            assert k.shape == (*kernel, ch, 1024), idx


class TestSAMPScorer:
    def test_score_batch(self, scoring_config):
        from facet_tpu.models.samp_net import COMPOSITION_PATTERNS, SAMPComposition

        scorer = SAMPComposition.create(scoring_config)
        rng = np.random.default_rng(0)
        images = [rng.integers(0, 256, (120, 180, 3), dtype=np.uint8),
                  rng.integers(0, 256, (90, 90, 3), dtype=np.uint8)]
        results = scorer.score_batch(images)
        assert len(results) == 2
        for r in results:
            assert 0.0 <= r["score"] <= 10.0
            assert r["pattern"] in COMPOSITION_PATTERNS
            assert abs(sum(r["pattern_weights"].values()) - 1.0) < 1e-5
            assert len(r["score_distribution"]) == 5
            assert r["power_point_score"] == pytest.approx(r["score"] / 2, abs=0.01)
        assert scorer.score_batch([]) == []

    def test_host_params_roundtrip(self, scoring_config):
        from facet_tpu.models.samp_net import SAMPComposition

        scorer = SAMPComposition.create(scoring_config)
        cached = scorer.host_params()
        rng = np.random.default_rng(1)
        img = [rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)]
        a = scorer.score_batch(img)
        b = SAMPComposition.create(scoring_config, cached).score_batch(img)
        assert a[0]["score"] == b[0]["score"]
        assert a[0]["pattern"] == b[0]["pattern"]
