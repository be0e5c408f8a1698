"""Multi-device sharding of the fused scoring pipeline.

Runs on the 8-virtual-CPU-device mesh (conftest). The sharded path must be
numerically identical to the single-device path, including when the batch is
not a multiple of the device count (zero-padding sliced off).
"""

import jax
import numpy as np
import pytest

TINY_ARCH = {"image_size": 28, "patch_size": 14, "width": 32, "layers": 1,
             "heads": 2, "projection_dim": 768}


@pytest.fixture(scope="module")
def fused_pair():
    """(sharded FusedScorer, single-device FusedScorer) on a tiny CLIP."""
    import jax.numpy as jnp

    from facet_tpu.models.aesthetic import AestheticHead
    from facet_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
    from facet_tpu.processing.device_pipeline import FusedScorer, default_mesh

    config = CLIPVisionConfig(**TINY_ARCH)
    vision = CLIPVisionTower(config, dtype=jnp.float32)
    head = AestheticHead()
    vp = vision.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 28, 28, 3), jnp.float32))
    hp = head.init(jax.random.PRNGKey(1), jnp.zeros((1, 768), jnp.float32))
    sharded = FusedScorer(vision, head, vp, hp)  # mesh="auto" -> 8-dev mesh
    single = FusedScorer(vision, head, vp, hp, mesh=None)
    return sharded, single


def _images(n, seed=0, h=40, w=56):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


class TestShardedFusedPipeline:
    def test_mesh_is_active(self, fused_pair):
        sharded, _ = fused_pair
        assert len(jax.devices()) == 8
        assert sharded.mesh is not None
        assert sharded.mesh.shape["dp"] == 8

    @pytest.mark.parametrize("n", [8, 16])
    def test_even_batch_matches_single_device(self, fused_pair, n):
        sharded, single = fused_pair
        images = _images(n)
        a = sharded.score_images(images)
        b = single.score_images(images)
        for (sa, ea, ha, ta), (sb, eb, hb, tb) in zip(a, b):
            assert sa == pytest.approx(sb, abs=1e-5)
            np.testing.assert_allclose(np.frombuffer(ea, np.float32),
                                       np.frombuffer(eb, np.float32),
                                       atol=1e-5)
            assert ha == hb
            np.testing.assert_array_equal(ta.gray_hist, tb.gray_hist)
            assert ta.lap_sumsq == tb.lap_sumsq
            assert ta.imm_abs_sum == tb.imm_abs_sum

    def test_pallas_fused_stats_under_shard_map(self, fused_pair,
                                                monkeypatch):
        """The one-pass stats kernel (FACET_ENTROPY_IMPL=pallas_fused)
        partitions under shard_map over 'dp' like the entropy kernel —
        pallas_call has no GSPMD rule, so this is the configuration that
        must work if the flag is ever enabled on a mesh."""
        import jax.numpy as jnp

        from facet_tpu.models.aesthetic import AestheticHead
        from facet_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
        from facet_tpu.processing.device_pipeline import FusedScorer

        _, single = fused_pair
        images = _images(9, seed=31)       # uneven: padding + kernel mask
        b = single.score_images(images)    # oracle BEFORE the env override
        monkeypatch.setenv("FACET_ENTROPY_IMPL", "pallas_fused")
        config = CLIPVisionConfig(**TINY_ARCH)
        vision = CLIPVisionTower(config, dtype=jnp.float32)
        head = AestheticHead()
        vp = vision.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 28, 28, 3), jnp.float32))
        hp = head.init(jax.random.PRNGKey(1), jnp.zeros((1, 768),
                                                        jnp.float32))
        kernel_sharded = FusedScorer(vision, head, vp, hp)
        assert kernel_sharded.mesh is not None
        a = kernel_sharded.score_images(images)   # impl resolves lazily here
        for (sa, _, ha, ta), (sb, _, hb, tb) in zip(a, b):
            assert sa == pytest.approx(sb, abs=1e-5)
            assert ha == hb
            np.testing.assert_array_equal(ta.gray_hist, tb.gray_hist)
            assert ta.hs_entropy == pytest.approx(tb.hs_entropy, abs=1e-5)
            assert ta.sat_sum == tb.sat_sum

    @pytest.mark.parametrize("n", [1, 3, 5, 11])
    def test_uneven_batch_padding_sliced(self, fused_pair, n):
        """Batches that don't divide the 8-way mesh pad with zeros; the
        padding must never leak into results."""
        sharded, single = fused_pair
        images = _images(n, seed=n)
        a = sharded.score_images(images)
        b = single.score_images(images)
        assert len(a) == n and all(r is not None for r in a)
        for (sa, ea, ha, ta), (sb, eb, hb, tb) in zip(a, b):
            assert sa == pytest.approx(sb, abs=1e-5)
            assert ha == hb
            assert int(ta.gray_hist.sum()) == 40 * 56  # every pixel counted

    def test_mixed_shapes(self, fused_pair):
        sharded, single = fused_pair
        images = _images(3, seed=7, h=40, w=56) + _images(2, seed=8, h=32, w=48)
        a = sharded.score_images(images)
        b = single.score_images(images)
        for (sa, *_), (sb, *_) in zip(a, b):
            assert sa == pytest.approx(sb, abs=1e-5)

    def test_output_is_sharded_on_device(self, fused_pair):
        """The fused program's outputs must actually be partitioned over the
        dp axis (not silently replicated/gathered on one device)."""
        from facet_tpu.parallel.mesh import shard_batch

        sharded, _ = fused_pair
        images = _images(8, seed=9)
        batch = np.stack(images)
        dev_batch, _ = shard_batch(batch, sharded.mesh)
        vp, hp = sharded._placed_params()
        out = sharded._pipeline(40, 56)(vp, hp, dev_batch)
        emb = out["embedding"]
        assert len(emb.sharding.device_set) == 8
        # batch axis split 8 ways -> each shard holds one image's embedding
        shard_shapes = {s.data.shape for s in emb.addressable_shards}
        assert shard_shapes == {(1, 768)}


class TestMemberSharding:
    """Every ensemble member's score path rides the dp mesh, not just CLIP."""

    def test_topiq_scorer_has_mesh(self, tmp_path, tmp_config):
        from facet_tpu.models.topiq import TOPIQScorer

        scorer = TOPIQScorer.create()
        assert scorer.mesh is not None and scorer.mesh.shape["dp"] == 8
        rng = np.random.default_rng(0)
        images = [rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
                  for _ in range(3)]  # uneven -> padding sliced
        scores = scorer.score_batch(images)
        assert len(scores) == 3
        assert all(0 <= s <= 10 for s in scores)

    def test_samp_scorer_has_mesh(self):
        from facet_tpu.models.samp_net import SAMPComposition

        samp = SAMPComposition.create()
        assert samp._mesh is not None
        rng = np.random.default_rng(1)
        images = [rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
                  for _ in range(2)]
        results = samp.score_batch(images)
        assert len(results) == 2
        assert all(0 <= r["score"] <= 10 for r in results)

    def test_face_detector_has_mesh(self, scoring_config):
        from facet_tpu.models.face_pipeline import FacePipeline

        pipeline = FacePipeline.create(scoring_config)
        assert pipeline._mesh is not None
        rng = np.random.default_rng(2)
        images = [rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)
                  for _ in range(3)]
        dets = pipeline.detect_batch(images)
        assert len(dets) == 3  # random-init detector: empty lists are fine


class TestEngineUsesShardedPath:
    def test_engine_fused_scorer_gets_mesh(self, tmp_path, tmp_config):
        """The production engine path must score through the mesh."""
        import json

        from facet_tpu.config.scoring_config import ScoringConfig
        from facet_tpu.processing.scorer import Facet

        with open(tmp_config) as fh:
            cfg = json.load(fh)
        cfg["models"]["clip"]["architecture"] = TINY_ARCH
        with open(tmp_config, "w") as fh:
            json.dump(cfg, fh)
        engine = Facet(str(tmp_path / "t.db"), ScoringConfig(tmp_config))
        fused = engine._fused_scorer()
        assert fused.mesh is not None and fused.mesh.shape["dp"] == 8


class TestShardedSimilarity:
    """Row-sharded face distance matrix + duplicate XOR/popcount
    (SURVEY §2.11) vs their single-device paths."""

    def test_pairwise_cosine_sharded(self):
        from facet_tpu.faces.distance import (normalize_embeddings,
                                              pairwise_cosine)
        from facet_tpu.parallel.mesh import get_mesh

        mesh = get_mesh(dp=8, tp=1, devices=tuple(jax.devices()[:8]))
        rng = np.random.default_rng(0)
        for n in (8, 29):          # divisible and padded row counts
            emb = normalize_embeddings(rng.standard_normal((n, 512)))
            want = pairwise_cosine(emb)
            got = pairwise_cosine(emb, mesh=mesh)
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_duplicate_pairs_sharded(self):
        from facet_tpu.parallel.mesh import get_mesh
        from facet_tpu.utils.duplicate import find_duplicate_pairs

        mesh = get_mesh(dp=8, tp=1, devices=tuple(jax.devices()[:8]))
        rng = np.random.default_rng(1)
        hashes = [f"{rng.integers(0, 1 << 63):016x}" for _ in range(21)]
        hashes[5] = hashes[2]
        hashes[9] = f"{int(hashes[2], 16) ^ 0b101:016x}"
        want = find_duplicate_pairs(hashes, max_distance=4)
        got = find_duplicate_pairs(hashes, max_distance=4, mesh=mesh)
        assert sorted(got) == sorted(want)
        assert (2, 5) in got and (2, 9) in got


class TestShardedPallasEntropy:
    def test_shard_map_pallas_entropy_matches_xla(self, fused_pair,
                                                  monkeypatch):
        """The production TPU entropy path (pallas kernel under shard_map
        over 'dp') must partition and agree with the single-device XLA
        result — this is the multi-chip story for the pallas kernel, run
        here via interpret mode on the 8-device CPU mesh."""
        import jax.numpy as jnp

        from facet_tpu.processing.device_pipeline import FusedScorer

        sharded, single = fused_pair
        monkeypatch.setenv("FACET_ENTROPY_IMPL", "pallas")
        pallas_sharded = FusedScorer(sharded.vision_tower, sharded.head,
                                     sharded.vision_params,
                                     sharded.head_params)
        assert pallas_sharded.mesh is not None
        images = _images(8, seed=5)
        a = pallas_sharded.score_images(images)
        monkeypatch.delenv("FACET_ENTROPY_IMPL")
        b = single.score_images(images)
        for (sa, _, _, ta), (sb, _, _, tb) in zip(a, b):
            assert ta.hs_entropy == pytest.approx(tb.hs_entropy, abs=1e-5)
            assert sa == pytest.approx(sb, abs=1e-5)


class TestBatchLengthBucketing:
    def test_group_counts_reuse_pow2_buckets(self, fused_pair):
        """score_images pads each shape group to a power-of-two batch
        (ops/stats.py _bucket_size discipline) so a mixed-size library
        compiles one fused program per bucket, not per distinct count
        (round-4 review finding)."""
        _, single = fused_pair
        seen = []
        orig = single._run

        def spy(h, w, batch):
            seen.append(batch.shape[0])
            return orig(h, w, batch)

        single._run = spy
        try:
            for n in (3, 5, 6, 7):
                res = single.score_images(_images(n, seed=10 + n))
                assert len(res) == n and all(r is not None for r in res)
        finally:
            single._run = orig
        assert seen == [4, 8, 8, 8]

    def test_bucket_padding_matches_exact_batch(self, fused_pair):
        """The zero rows a bucket adds must not change any real image's
        outputs (per-image math; also pins the pHash/stats epilogues
        index only real rows)."""
        _, single = fused_pair
        images = _images(3, seed=42)
        got = single.score_images(images)          # runs at bucket 4
        want = [single.score_images([img])[0] for img in images]
        for (sa, ea, ha, ta), (sb, eb, hb, tb) in zip(got, want):
            assert sa == pytest.approx(sb, abs=1e-5)
            assert ha == hb
            np.testing.assert_array_equal(ta.gray_hist, tb.gray_hist)
            assert ta.hs_entropy == pytest.approx(tb.hs_entropy, abs=1e-5)
