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
