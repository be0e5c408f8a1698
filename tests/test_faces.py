"""Faces subsystem tests: EAR blink math, clustering, merge suggestions,
pipeline machinery with synthetic detections."""

import numpy as np
import pytest

from facet_tpu.db.connection import get_connection
from facet_tpu.db.schema import init_database


def make_landmarks(ear_open=True):
    """Synthetic 106-point landmark set with controlled eye aspect ratio."""
    lm = np.zeros((106, 2), np.float32)
    spread = 10.0 if ear_open else 1.0
    # left eye: indices [35 outer, 39 inner, 37/38 upper, 41/40 lower]
    lm[35] = [0, 50]; lm[39] = [30, 50]
    lm[37] = [10, 50 - spread / 2]; lm[38] = [20, 50 - spread / 2]
    lm[41] = [10, 50 + spread / 2]; lm[40] = [20, 50 + spread / 2]
    # right eye: [89, 93, 91/92 upper, 95/94 lower]
    lm[89] = [60, 50]; lm[93] = [90, 50]
    lm[91] = [70, 50 - spread / 2]; lm[92] = [80, 50 - spread / 2]
    lm[95] = [70, 50 + spread / 2]; lm[94] = [80, 50 + spread / 2]
    return lm


class TestEAR:
    def test_open_vs_closed(self):
        from facet_tpu.models.face_pipeline import average_ear

        open_ear = average_ear(make_landmarks(ear_open=True))
        closed_ear = average_ear(make_landmarks(ear_open=False))
        assert open_ear > 0.25
        assert closed_ear < 0.1

    def test_blink_recompute(self, tmp_db, scoring_config):
        from facet_tpu.faces.blink import recompute_blinks

        with get_connection(tmp_db) as conn:
            for name, open_eyes in (("a", True), ("b", False)):
                conn.execute("INSERT INTO photos (path, face_count) VALUES (?, 1)",
                             (f"/{name}.jpg",))
                conn.execute(
                    "INSERT INTO faces (photo_path, face_index, embedding,"
                    " landmark_2d_106) VALUES (?, 0, x'00', ?)",
                    (f"/{name}.jpg",
                     make_landmarks(ear_open=open_eyes).tobytes()))
        n = recompute_blinks(tmp_db, scoring_config, update_aggregates=False,
                             verbose=False)
        assert n == 2
        with get_connection(tmp_db) as conn:
            flags = dict(conn.execute("SELECT path, is_blink FROM photos"))
        assert flags["/a.jpg"] == 0 and flags["/b.jpg"] == 1


def synth_embeddings(rng, n_clusters=3, per_cluster=6, dim=512, noise=0.05):
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    embs, labels = [], []
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + noise * rng.standard_normal(dim).astype(np.float32)
            embs.append(v / np.linalg.norm(v))
            labels.append(c)
    return np.stack(embs), np.array(labels), centers


class TestClustering:
    @pytest.fixture
    def face_db(self, tmp_db):
        rng = np.random.default_rng(0)
        embs, labels, centers = synth_embeddings(rng)
        with get_connection(tmp_db) as conn:
            for i, (emb, lab) in enumerate(zip(embs, labels)):
                path = f"/photo_{i}.jpg"
                conn.execute("INSERT INTO photos (path) VALUES (?)", (path,))
                conn.execute(
                    "INSERT INTO faces (photo_path, face_index, embedding,"
                    " confidence, face_thumbnail) VALUES (?, 0, ?, 0.9, x'FF')",
                    (path, emb.astype(np.float32).tobytes()))
        return tmp_db, labels

    def test_clusters_recovered(self, face_db, scoring_config):
        from facet_tpu.faces.clusterer import FaceClusterer

        db, labels = face_db
        clusterer = FaceClusterer(db, scoring_config)
        stats = clusterer.cluster_faces(verbose=False)
        assert stats["new_persons"] == 3
        with get_connection(db) as conn:
            rows = conn.execute(
                "SELECT photo_path, person_id FROM faces ORDER BY photo_path").fetchall()
            assigned = {r[0]: r[1] for r in rows}
            persons = conn.execute(
                "SELECT id, face_count, centroid FROM persons").fetchall()
        assert len(persons) == 3
        for pid, count, centroid in persons:
            assert count == 6
            assert len(centroid) == 512 * 4
        # photos of the same synthetic identity share a person
        by_label = {}
        for i, lab in enumerate(labels):
            by_label.setdefault(lab, set()).add(assigned[f"/photo_{i}.jpg"])
        for members in by_label.values():
            assert len(members) == 1

    def test_incremental_keeps_assignments(self, face_db, scoring_config):
        from facet_tpu.faces.clusterer import FaceClusterer

        db, _ = face_db
        clusterer = FaceClusterer(db, scoring_config)
        clusterer.cluster_faces(verbose=False)
        # new faces of an existing identity should match, not fork
        with get_connection(db) as conn:
            centroid = np.frombuffer(conn.execute(
                "SELECT centroid FROM persons LIMIT 1").fetchone()[0], np.float32)
            pid = conn.execute("SELECT id FROM persons LIMIT 1").fetchone()[0]
            rng = np.random.default_rng(7)
            for i in range(3):
                v = centroid + 0.03 * rng.standard_normal(512).astype(np.float32)
                v /= np.linalg.norm(v)
                path = f"/new_{i}.jpg"
                conn.execute("INSERT INTO photos (path) VALUES (?)", (path,))
                conn.execute(
                    "INSERT INTO faces (photo_path, face_index, embedding)"
                    " VALUES (?, 0, ?)", (path, v.astype(np.float32).tobytes()))
        stats = clusterer.cluster_faces(verbose=False)
        assert stats["matched"] >= 1 and stats["new_persons"] == 0
        with get_connection(db) as conn:
            new_pids = {r[0] for r in conn.execute(
                "SELECT person_id FROM faces WHERE photo_path LIKE '/new_%'")}
        # every assigned new face joined the existing person; HDBSCAN may
        # leave a minority as noise (unassigned) until more data arrives
        assert pid in new_pids
        assert new_pids - {None} == {pid}

    def test_force_mode_wipes(self, face_db, scoring_config):
        from facet_tpu.faces.clusterer import FaceClusterer

        db, _ = face_db
        clusterer = FaceClusterer(db, scoring_config)
        clusterer.cluster_faces(verbose=False)
        stats = clusterer.cluster_faces(mode="force", verbose=False)
        assert stats["new_persons"] == 3  # rebuilt from scratch

    def test_match_single_face(self, face_db, scoring_config):
        from facet_tpu.faces.clusterer import FaceClusterer

        db, _ = face_db
        clusterer = FaceClusterer(db, scoring_config)
        clusterer.cluster_faces(verbose=False)
        with get_connection(db) as conn:
            pid, blob = conn.execute(
                "SELECT id, centroid FROM persons LIMIT 1").fetchone()
        matched, sim = clusterer.match_face_to_person(np.frombuffer(blob, np.float32))
        assert matched == pid and sim > 0.99
        rng = np.random.default_rng(3)
        noise = rng.standard_normal(512).astype(np.float32)
        matched, _ = clusterer.match_face_to_person(noise)
        assert matched is None


class TestMergeSuggestions:
    def test_similar_persons_suggested(self, tmp_db):
        from facet_tpu.faces.merge_analyzer import find_merge_suggestions, merge_persons

        rng = np.random.default_rng(1)
        base = rng.standard_normal(512).astype(np.float32)
        base /= np.linalg.norm(base)
        near = base + 0.02 * rng.standard_normal(512).astype(np.float32)
        near /= np.linalg.norm(near)
        far = rng.standard_normal(512).astype(np.float32)
        far /= np.linalg.norm(far)
        with get_connection(tmp_db) as conn:
            for name, c in (("alice", base), ("alice2", near), ("bob", far)):
                conn.execute(
                    "INSERT INTO persons (name, centroid) VALUES (?, ?)",
                    (name, c.tobytes()))
        suggestions = find_merge_suggestions(tmp_db, threshold=0.55)
        assert len(suggestions) == 1
        assert sorted(suggestions[0]["names"]) == ["alice", "alice2"]

        ids = suggestions[0]["person_ids"]
        # merging needs face rows to recount; create one per person
        with get_connection(tmp_db) as conn:
            conn.execute("INSERT INTO photos (path) VALUES ('/m.jpg')")
            for pid in ids:
                conn.execute(
                    "INSERT INTO faces (photo_path, face_index, embedding, person_id)"
                    " VALUES ('/m.jpg', ?, ?, ?)", (pid, base.tobytes(), pid))
        merge_persons(tmp_db, ids[0], ids[1:])
        with get_connection(tmp_db) as conn:
            remaining = {r[0] for r in conn.execute("SELECT id FROM persons")}
        assert ids[0] in remaining
        assert not any(pid in remaining for pid in ids[1:])


class TestFacePipelineMachinery:
    def test_empty_on_random_weights(self, scoring_config):
        """Random-init detector must cleanly detect nothing (1% cls prior)."""
        from facet_tpu.models.face_pipeline import FacePipeline

        pipeline = FacePipeline.create(scoring_config)
        rng = np.random.default_rng(0)
        images = [rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)]
        results = pipeline.analyze_batch(images)
        assert results[0]["face_count"] == 0
        assert results[0]["rows"] == []

    def test_aggregate_contract(self, scoring_config):
        """Inject synthetic detections and check the aggregation math."""
        from facet_tpu.models.face_pipeline import FacePipeline

        pipeline = FacePipeline.create(scoring_config)
        rng = np.random.default_rng(0)
        image = rng.integers(0, 256, (400, 600, 3), dtype=np.uint8)
        faces = []
        for k, score in enumerate((0.9, 0.8)):
            det = {"score": score,
                   "bbox": np.array([50 + 200 * k, 50, 150 + 200 * k, 180], np.float32),
                   "kps": np.zeros((5, 2), np.float32)}
            lm = make_landmarks(ear_open=True)
            lm[:, 0] += 60 + 200 * k
            lm[:, 1] += 60
            faces.append({"det": det, "embedding": rng.standard_normal(512)
                          .astype(np.float32), "landmarks": lm})
        out = pipeline._aggregate(image, faces)
        assert out["face_count"] == 2
        # quality = 0.7*min + 0.3*avg of det_score*10
        assert out["face_quality"] == pytest.approx(0.7 * 8 + 0.3 * 8.5, abs=1e-6)
        assert out["is_blink"] == 0
        assert out["combined_bbox"] == [50, 50, 350, 180]
        area = 2 * (100 * 130)
        assert out["face_ratio"] == pytest.approx(area / (400 * 600))
        assert len(out["rows"]) == 2
        assert len(out["rows"][0]["embedding"]) == 512 * 4
        assert len(out["rows"][0]["landmarks"]) == 106 * 2 * 4
        assert out["rows"][0]["thumbnail"][:2] == b"\xff\xd8"


class TestSingleClusterRetryGuard:
    def test_distinct_oneoff_identities_stay_noise(self, tmp_db,
                                                   scoring_config):
        """Many different one-face people also produce an all-noise first
        HDBSCAN pass; the allow_single_cluster retry must NOT merge them
        into one mega-person (round-4 review finding). The retry only
        sticks when the root cluster is actually one identity."""
        from facet_tpu.faces.clusterer import FaceClusterer

        rng = np.random.default_rng(3)
        with get_connection(tmp_db) as conn:
            for i in range(24):
                # 24 far-apart identities: random unit vectors are nearly
                # orthogonal at 512-d (cos ~ 0 << merge_threshold)
                emb = rng.standard_normal(512).astype(np.float32)
                emb /= np.linalg.norm(emb)
                path = f"/solo_{i}.jpg"
                conn.execute("INSERT INTO photos (path) VALUES (?)", (path,))
                conn.execute(
                    "INSERT INTO faces (photo_path, face_index, embedding,"
                    " confidence, face_thumbnail) VALUES (?, 0, ?, 0.9,"
                    " x'FF')", (path, emb.tobytes()))
        clusterer = FaceClusterer(tmp_db, scoring_config)
        stats = clusterer.cluster_faces(mode="force", verbose=False)
        with get_connection(tmp_db) as conn:
            max_members = conn.execute(
                "SELECT COALESCE(MAX(c), 0) FROM (SELECT COUNT(*) c FROM"
                " faces WHERE person_id IS NOT NULL GROUP BY person_id)"
            ).fetchone()[0]
        # near-orthogonal embeddings (cos ~ 0) can never pass the identity
        # bar, whatever grouping HDBSCAN's degenerate-distance tree invents
        assert max_members == 0, (stats, max_members)

    def test_single_identity_still_clusters(self, tmp_db, scoring_config):
        """The retry's legitimate case keeps working: one identity's faces
        (tight cloud) cluster into one person."""
        from facet_tpu.faces.clusterer import FaceClusterer

        rng = np.random.default_rng(4)
        center = rng.standard_normal(512).astype(np.float32)
        center /= np.linalg.norm(center)
        with get_connection(tmp_db) as conn:
            for i in range(6):
                emb = center + rng.standard_normal(512).astype(
                    np.float32) * 0.05
                emb /= np.linalg.norm(emb)
                path = f"/same_{i}.jpg"
                conn.execute("INSERT INTO photos (path) VALUES (?)", (path,))
                conn.execute(
                    "INSERT INTO faces (photo_path, face_index, embedding,"
                    " confidence, face_thumbnail) VALUES (?, 0, ?, 0.9,"
                    " x'FF')", (path, emb.tobytes()))
        clusterer = FaceClusterer(tmp_db, scoring_config)
        clusterer.cluster_faces(mode="force", verbose=False)
        with get_connection(tmp_db) as conn:
            counts = [r[0] for r in conn.execute(
                "SELECT COUNT(*) FROM faces WHERE person_id IS NOT NULL"
                " GROUP BY person_id")]
        # the allow_single_cluster retry still assigns this identity (the
        # root-cluster membership HDBSCAN returns is its own call; the
        # guard must not reject it)
        assert counts and max(counts) >= 2


def test_blink_recompute_resets_stale_flags(tmp_db, scoring_config):
    """A stale is_blink=1 on a photo whose faces lack valid landmarks must
    clear on recompute (reference scorer.py:1430 resets first)."""
    from facet_tpu.faces.blink import recompute_blinks

    with get_connection(tmp_db) as conn:
        conn.execute("INSERT INTO photos (path, face_count, is_blink,"
                     " aggregate) VALUES ('/stale.jpg', 1, 1, 5.0)")
        conn.execute("INSERT INTO faces (photo_path, face_index, embedding,"
                     " landmark_2d_106) VALUES ('/stale.jpg', 0, x'00',"
                     " NULL)")
    recompute_blinks(tmp_db, scoring_config, update_aggregates=False,
                     verbose=False)
    with get_connection(tmp_db) as conn:
        val = conn.execute("SELECT is_blink FROM photos WHERE path ="
                           " '/stale.jpg'").fetchone()[0]
    assert val == 0


def test_blink_stale_clear_refreshes_aggregates(tmp_db, scoring_config,
                                                monkeypatch):
    """When the recompute only CLEARS stale flags (no face has valid
    landmarks, so blink_by_photo is empty) the aggregate refresh must
    still run — the blink penalty is baked into the stored aggregate
    (sixth-review-pass finding)."""
    from facet_tpu.faces.blink import recompute_blinks

    calls = []

    class FakeFacet:
        def __init__(self, db_path, config, lightweight=True):
            pass

        def update_all_aggregates(self, rescore_embeddings=False):
            calls.append(rescore_embeddings)

    monkeypatch.setattr("facet_tpu.processing.scorer.Facet", FakeFacet)
    with get_connection(tmp_db) as conn:
        conn.execute("INSERT INTO photos (path, face_count, is_blink,"
                     " aggregate) VALUES ('/stale.jpg', 1, 1, 5.0)")
        conn.execute("INSERT INTO faces (photo_path, face_index, embedding,"
                     " landmark_2d_106) VALUES ('/stale.jpg', 0, x'00',"
                     " NULL)")
    recompute_blinks(tmp_db, scoring_config, update_aggregates=True,
                     verbose=False)
    assert calls == [False]

    # and with nothing to change, the refresh must NOT run again
    calls.clear()
    recompute_blinks(tmp_db, scoring_config, update_aggregates=True,
                     verbose=False)
    assert calls == []
