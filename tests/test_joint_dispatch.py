"""Joint dispatch: the fused scoring program and the SCRFD detection
program share ONE resident device batch per chunk (one host->device
transfer, back-to-back dispatch, a single fetch) and must produce results
identical to the separate score_images / detect_batch paths.

Reference behavior being accelerated: the reference transfers each batch
to the GPU once per model stage (processing/scorer.py score_batch ->
analyzers/face.py detect); here the engine's hot path dispatches both
programs on the same resident buffer, matching the dispatch discipline
bench.py measures (docs/PERF.md: serialized fetch-per-program ran 83.8
vs 123.0 img/s pipelined at b64).
"""

import jax
import numpy as np
import pytest

TINY_ARCH = {"image_size": 28, "patch_size": 14, "width": 32, "layers": 1,
             "heads": 2, "projection_dim": 768}


@pytest.fixture(scope="module")
def fused_pair():
    """(sharded, single-device) FusedScorer on a tiny CLIP."""
    import jax.numpy as jnp

    from facet_tpu.models.aesthetic import AestheticHead
    from facet_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower
    from facet_tpu.processing.device_pipeline import FusedScorer

    config = CLIPVisionConfig(**TINY_ARCH)
    vision = CLIPVisionTower(config, dtype=jnp.float32)
    head = AestheticHead()
    vp = vision.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 28, 28, 3), jnp.float32))
    hp = head.init(jax.random.PRNGKey(1), jnp.zeros((1, 768), jnp.float32))
    return (FusedScorer(vision, head, vp, hp),        # mesh="auto" -> 8-dev
            FusedScorer(vision, head, vp, hp, mesh=None))


@pytest.fixture(scope="module")
def pipeline():
    from facet_tpu.models.face_pipeline import FacePipeline

    return FacePipeline.create(None)


def _images(n, seed=0, h=40, w=56):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def _assert_detections_equal(a, b):
    assert len(a) == len(b)
    for da, db in zip(a, b):
        assert len(da) == len(db)
        for fa, fb in zip(da, db):
            assert fa["score"] == pytest.approx(fb["score"], abs=1e-4)
            np.testing.assert_allclose(fa["bbox"], fb["bbox"], atol=1e-3)
            np.testing.assert_allclose(fa["kps"], fb["kps"], atol=1e-3)


class TestJointDispatch:
    def test_joint_matches_separate_paths(self, fused_pair, pipeline):
        """score_images(face_pipeline=...) == score_images() + detect_batch(),
        with a threshold that keeps every top-k candidate so the decode
        path is exercised on NON-empty detections."""
        _, single = fused_pair
        images = _images(5, seed=3) + _images(2, seed=4, h=32, w=48)
        old = pipeline.score_threshold
        pipeline.score_threshold = -1e9   # keep all candidates
        try:
            joint_res, joint_dets = single.score_images(
                images, face_pipeline=pipeline)
            sep_res = single.score_images(images)
            sep_dets = pipeline.detect_batch(images)
        finally:
            pipeline.score_threshold = old
        assert any(len(d) for d in joint_dets), "decode path never exercised"
        for (sa, ea, ha, ta), (sb, eb, hb, tb) in zip(joint_res, sep_res):
            assert sa == pytest.approx(sb, abs=1e-5)
            assert ha == hb
            np.testing.assert_array_equal(ta.gray_hist, tb.gray_hist)
        _assert_detections_equal(joint_dets, sep_dets)

    def test_joint_on_mesh_matches_single_device(self, fused_pair, pipeline):
        """The joint path under the 8-device dp mesh (detection program fed
        the SAME sharded batch as the shard_mapped fused program)."""
        sharded, single = fused_pair
        assert sharded.mesh is not None
        images = _images(11, seed=6)  # uneven: forces padding on the mesh
        old = pipeline.score_threshold
        pipeline.score_threshold = -1e9
        try:
            a_res, a_dets = sharded.score_images(images, face_pipeline=pipeline)
            b_res, b_dets = single.score_images(images, face_pipeline=pipeline)
        finally:
            pipeline.score_threshold = old
        for (sa, *_), (sb, *_) in zip(a_res, b_res):
            assert sa == pytest.approx(sb, abs=1e-5)
        _assert_detections_equal(a_dets, b_dets)

    def test_production_threshold_matches_detect_batch(self, fused_pair,
                                                       pipeline):
        """At the production threshold (no override) the joint decode and
        the standalone detect_batch agree, whatever the random-init
        detector emits."""
        _, single = fused_pair
        images = _images(2, seed=9)
        assert pipeline.score_threshold == 0.5
        res, dets = single.score_images(images, face_pipeline=pipeline)
        assert len(res) == 2 and all(r is not None for r in res)
        _assert_detections_equal(dets, pipeline.detect_batch(images))

    def test_analyze_batch_accepts_prefetched_detections(self, pipeline):
        """analyze_batch(detections=...) skips detection and runs the
        secondary stages on the injected faces."""
        from facet_tpu.models.face_models import ARCFACE_DST

        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
        det = {"score": 0.92,
               "bbox": np.array([40.0, 30.0, 150.0, 170.0], np.float32),
               "kps": (ARCFACE_DST + np.array([40.0, 30.0])).astype(np.float32)}
        out = pipeline.analyze_batch([image, image], detections=[[det], []])
        assert out[0]["face_count"] == 1
        assert out[0]["face_quality"] == pytest.approx(9.2, abs=1e-6)
        assert len(np.frombuffer(out[0]["rows"][0]["embedding"],
                                 np.float32)) == 512
        assert out[1]["face_count"] == 0

    def test_analyze_batch_default_still_detects(self, pipeline):
        """detections=None keeps the original behavior (detect inside)."""
        images = _images(2, seed=12, h=64, w=64)
        a = pipeline.analyze_batch(images)
        b = pipeline.analyze_batch(images,
                                   detections=pipeline.detect_batch(images))
        assert [r["face_count"] for r in a] == [r["face_count"] for r in b]


@pytest.fixture(scope="module")
def rider_params():
    """Small TOPIQ + SAMP/U2NetP parameter trees for rider tests."""
    from facet_tpu.models.checkpoints import fallback_init, sds
    from facet_tpu.models.samp_net import SAMPNet
    from facet_tpu.models.topiq import TOPIQConfig, TOPIQNet
    from facet_tpu.models.u2netp import U2NETP

    tcfg = TOPIQConfig(input_size=64, max_device_batch=2)
    tparams = fallback_init(TOPIQNet(tcfg), sds((1, 64, 64, 3)), seed=40)
    samp = fallback_init(SAMPNet(), sds((1, 224, 224, 3)),
                         sds((1, 224, 224, 1)), seed=41)
    u2 = fallback_init(U2NETP(), sds((1, 224, 224, 3)), seed=42)
    return tcfg, tparams, samp, u2


def _assert_samp_equal(a, b):
    assert len(a) == len(b)
    for da, db in zip(a, b):
        assert da["pattern"] == db["pattern"]
        assert da["score"] == pytest.approx(db["score"], abs=0.011)
        np.testing.assert_allclose(da["score_distribution"],
                                   db["score_distribution"], atol=1e-5)
        np.testing.assert_allclose(da["attributes"], db["attributes"],
                                   atol=1e-5)


class TestRiderDispatch:
    """TOPIQ + SAMP riding the fused program's resident batch must match
    their separate score_batch paths — the engine's joint group then
    transfers the full-resolution batch once instead of four times."""

    def test_riders_match_separate_paths(self, fused_pair, rider_params):
        from facet_tpu.models.samp_net import SAMPComposition
        from facet_tpu.models.topiq import TOPIQScorer

        _, single = fused_pair
        tcfg, tparams, samp_p, u2_p = rider_params
        topiq = TOPIQScorer(tparams, tcfg)
        topiq.mesh = None                 # match the single-device scorer
        samp = SAMPComposition(samp_p, u2_p)
        samp._mesh = None
        # 7 images pad to bucket 8; max_device_batch=2 forces the rider to
        # slice the resident buffer into 4 sub-dispatches
        images = _images(7, seed=21)
        res, dets, rider = single.score_images(
            images, riders={"quality": topiq, "samp": samp})
        assert dets is None
        sep_res = single.score_images(images)
        for (sa, *_), (sb, *_) in zip(res, sep_res):
            assert sa == pytest.approx(sb, abs=1e-5)
        want_t = topiq.score_batch(images)
        # score_batch rounds to 2 decimals; padding-batch layouts may move
        # the raw value by float noise across the rounding boundary
        for got, want in zip(rider["quality"], want_t):
            assert got == pytest.approx(want, abs=0.011)
        _assert_samp_equal(rider["samp"], samp.score_batch(images))

    def test_riders_on_mesh_match_single_device(self, fused_pair,
                                                rider_params):
        from dataclasses import replace

        from facet_tpu.models.samp_net import SAMPComposition
        from facet_tpu.models.topiq import TOPIQScorer

        sharded, _ = fused_pair
        assert sharded.mesh is not None
        tcfg, tparams, samp_p, u2_p = rider_params
        # max_device_batch=1 -> mesh cap = 8: an 11-image batch (bucket 16)
        # slices the SHARDED resident buffer at shard-aligned boundaries
        mesh_tcfg = replace(tcfg, max_device_batch=1)
        topiq = TOPIQScorer(tparams, mesh_tcfg)
        assert topiq.mesh is not None
        samp = SAMPComposition(samp_p, u2_p)
        assert samp._mesh is not None
        ref_topiq = TOPIQScorer(tparams, tcfg)
        ref_topiq.mesh = None
        ref_samp = SAMPComposition(samp_p, u2_p)
        ref_samp._mesh = None
        images = _images(11, seed=23)
        res, dets, rider = sharded.score_images(
            images, riders={"quality": topiq, "samp": samp})
        assert dets is None
        for got, want in zip(rider["quality"], ref_topiq.score_batch(images)):
            assert got == pytest.approx(want, abs=0.011)
        _assert_samp_equal(rider["samp"], ref_samp.score_batch(images))

    def test_riders_compose_with_face_pipeline(self, fused_pair, pipeline,
                                               rider_params):
        """All four members of a 16gb-profile group on ONE resident batch."""
        from facet_tpu.models.topiq import TOPIQScorer

        _, single = fused_pair
        tcfg, tparams, *_ = rider_params
        topiq = TOPIQScorer(tparams, tcfg)
        topiq.mesh = None
        images = _images(3, seed=25)
        res, dets, rider = single.score_images(
            images, face_pipeline=pipeline, riders={"quality": topiq})
        assert len(res) == 3 and all(r is not None for r in res)
        assert dets is not None and len(dets) == 3
        _assert_detections_equal(dets, pipeline.detect_batch(images))
        for got, want in zip(rider["quality"], topiq.score_batch(images)):
            assert got == pytest.approx(want, abs=0.011)
