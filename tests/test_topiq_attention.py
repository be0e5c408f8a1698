"""ChunkedAttention == flax MultiHeadDotProductAttention, exactly.

The TOPIQ cross-scale levels use a query-chunked attention so the C2 level
(9216 queries x 2304 keys) never materializes its ~340 MB/image score
buffer (facet_tpu/models/topiq.py:ChunkedAttention). Chunking the query
axis must be mathematically exact — each score row's softmax is
independent — and the parameter tree must match the stock flax module so
pyiqa checkpoints convert unchanged (reference: models/pyiqa_scorer.py
loads topiq_nr through pyiqa; our converter targets the flax MHA layout).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def shapes():
    return dict(batch=2, nq=12, nk=5, width=16, heads=4)


class TestChunkedAttention:
    def _pair(self, shapes, q_chunk):
        from facet_tpu.models.topiq import ChunkedAttention

        ours = ChunkedAttention(num_heads=shapes["heads"],
                                qkv_features=shapes["width"],
                                q_chunk=q_chunk)
        stock = nn.MultiHeadDotProductAttention(
            num_heads=shapes["heads"], qkv_features=shapes["width"])
        return ours, stock

    def _inputs(self, shapes):
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(shapes["batch"], shapes["nq"],
                                         shapes["width"])), jnp.float32)
        kv = jnp.asarray(rng.normal(size=(shapes["batch"], shapes["nk"],
                                          shapes["width"])), jnp.float32)
        return q, kv

    def test_param_tree_matches_stock_module(self, shapes):
        ours, stock = self._pair(shapes, q_chunk=4)
        q, kv = self._inputs(shapes)
        p_ours = ours.init(jax.random.PRNGKey(0), q, kv)
        p_stock = stock.init(jax.random.PRNGKey(0), q, kv)
        ref = jax.tree_util.tree_map(lambda a: a.shape, p_stock)
        got = jax.tree_util.tree_map(lambda a: a.shape, p_ours)
        assert got == ref

    @pytest.mark.parametrize("q_chunk", [3, 4, 6, 64])
    def test_output_matches_stock_module(self, shapes, q_chunk):
        """Exact same params -> same output, chunked or not (q_chunk=4
        divides nq=12 and scans; 3 and 6 divide too; 64 > nq runs the
        unchunked branch)."""
        ours, stock = self._pair(shapes, q_chunk)
        q, kv = self._inputs(shapes)
        params = stock.init(jax.random.PRNGKey(1), q, kv)
        expected = stock.apply(params, q, kv)
        got = ours.apply(params, q, kv)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-5, atol=2e-6)

    def test_chunked_equals_unchunked(self, shapes):
        ours_c, _ = self._pair(shapes, q_chunk=4)
        ours_u, _ = self._pair(shapes, q_chunk=4096)
        q, kv = self._inputs(shapes)
        params = ours_u.init(jax.random.PRNGKey(2), q, kv)
        np.testing.assert_allclose(np.asarray(ours_c.apply(params, q, kv)),
                                   np.asarray(ours_u.apply(params, q, kv)),
                                   rtol=2e-5, atol=2e-6)

    def test_topiq_forward_still_runs(self):
        """Whole net end-to-end at a tiny input size on CPU."""
        from facet_tpu.models.topiq import TOPIQConfig, TOPIQNet

        cfg = TOPIQConfig(input_size=64)
        net = TOPIQNet(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = net.init(jax.random.PRNGKey(3), x)
        out = net.apply(params, x)
        assert out.shape == (1,)
        assert np.isfinite(np.asarray(out)).all()
