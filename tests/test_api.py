"""API tests: every router through the in-process WSGI test client."""

import numpy as np
import pytest

from facet_tpu.db.connection import get_connection


@pytest.fixture
def seeded_db(tmp_db):
    """A database with a small scored library + faces + persons."""
    rng = np.random.default_rng(0)
    import io
    from PIL import Image

    def thumb(color):
        buf = io.BytesIO()
        Image.new("RGB", (64, 48), color).save(buf, "JPEG")
        return buf.getvalue()

    with get_connection(tmp_db) as conn:
        for i in range(12):
            path = f"/pics/img{i:02d}.jpg"
            conn.execute(
                "INSERT INTO photos (path, filename, date_taken, camera_model,"
                " lens_model, iso, f_stop, aggregate, aesthetic, comp_score,"
                " tech_sharpness, face_count, face_ratio, face_quality,"
                " is_blink, is_monochrome, is_burst_lead, category, tags,"
                " thumbnail, phash, mean_luminance, star_rating)"
                " VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?,"
                " ?, ?, ?, ?, ?, ?)",
                (path, f"img{i:02d}.jpg", f"2026:0{i % 9 + 1}:10 12:00:00",
                 "CamA" if i % 2 else "CamB", "50mm", 100 * (i + 1),
                 2.8, 4.0 + i * 0.5, 5.0 + i * 0.3, 6.0, 7.0,
                 1 if i < 4 else 0, 0.2 if i < 4 else 0.0,
                 7.5 if i < 4 else None, 1 if i == 3 else 0,
                 1 if i == 5 else 0, 1, "portrait" if i < 4 else "landscape",
                 "sunset, beach" if i >= 4 else "",
                 thumb((i * 20 % 255, 100, 150)),
                 f"{i:016x}", 0.5, i % 6))
            if i >= 4:
                conn.execute(
                    "INSERT INTO photo_tags (photo_path, tag) VALUES (?, 'sunset')",
                    (path,))
        # faces + person
        emb = rng.standard_normal(512).astype(np.float32)
        emb /= np.linalg.norm(emb)
        conn.execute("INSERT INTO persons (id, name, face_count, centroid,"
                     " face_thumbnail) VALUES (1, 'Alice', 2, ?, ?)",
                     (emb.tobytes(), thumb((200, 100, 100))))
        for i in range(2):
            conn.execute(
                "INSERT INTO faces (photo_path, face_index, embedding,"
                " bbox_x1, bbox_y1, bbox_x2, bbox_y2, confidence, person_id,"
                " face_thumbnail) VALUES (?, 0, ?, 10, 10, 50, 50, 0.9, 1, ?)",
                (f"/pics/img{i:02d}.jpg", emb.tobytes(), thumb((50, 50, 50))))
    return tmp_db


@pytest.fixture
def client(seeded_db, tmp_config):
    from facet_tpu.api import create_app
    from facet_tpu.web import TestClient

    app = create_app(db_path=seeded_db, config_path=tmp_config)
    return TestClient(app)


class TestGallery:
    def test_photos_default(self, client):
        res = client.get("/api/photos")
        assert res.status_code == 200
        data = res.json()
        assert data["total"] == 11  # viewer defaults hide the blink photo
        assert len(data["photos"]) == 11
        everything = client.get("/api/photos",
                                params={"hide_blinks": "false"}).json()
        assert everything["total"] == 12
        # default sort: aggregate desc
        scores = [p["aggregate"] for p in data["photos"]]
        assert scores == sorted(scores, reverse=True)
        assert data["photos"][0]["tags"] == ["sunset", "beach"]

    def test_pagination(self, client):
        res = client.get("/api/photos", params={"page": 2, "page_size": 5})
        data = res.json()
        assert len(data["photos"]) == 5
        assert data["pages"] == 3

    def test_filters(self, client):
        assert client.get("/api/photos", params={"camera": "CamA",
                                                 "hide_blinks": "false"}).json()["total"] == 6
        assert client.get("/api/photos", params={"category": "portrait",
                                                 "hide_blinks": "false"}).json()["total"] == 4
        assert client.get("/api/photos", params={"tag": "sunset"}).json()["total"] == 8
        assert client.get("/api/photos", params={"min_score": 8.0}).json()["total"] == 4
        assert client.get("/api/photos", params={"person_id": 1,
                                                 "hide_blinks": "false"}).json()["total"] == 2

    def test_hide_blinks_default(self, client):
        data = client.get("/api/photos", params={"category": "portrait"}).json()
        assert data["total"] == 3  # img03 is a blink

    def test_type_counts(self, client):
        counts = client.get("/api/type_counts").json()
        assert counts["all"] == 12
        assert counts["monochrome"] == 1
        assert counts["blinks"] == 1

    def test_similar(self, client):
        res = client.get("/api/similar_photos/pics/img00.jpg",
                         params={"max_distance": 5})
        assert res.status_code == 200
        sim = res.json()["similar"]
        # neighboring ints differ by few bits
        assert any(s["path"] == "/pics/img01.jpg" for s in sim)

    def test_bad_sort_rejected(self, client):
        assert client.get("/api/photos", params={"sort": "path; DROP"}).status_code == 400

    def test_config(self, client):
        cfg = client.get("/api/config").json()
        assert "quality_thresholds" in cfg and cfg["role"] == "admin"


class TestStats:
    def test_overview(self, client):
        data = client.get("/api/stats/overview").json()
        assert data["total_photos"] == 12
        assert data["persons"] == 1
        assert data["quality_counts"]["good"] >= 1

    def test_distribution_and_gear(self, client):
        dist = client.get("/api/stats/score_distribution").json()
        assert sum(dist["counts"]) == 12
        gear = client.get("/api/stats/gear").json()
        assert {c["camera"] for c in gear["cameras"]} == {"CamA", "CamB"}

    def test_timeline_categories_correlations(self, client):
        timeline = client.get("/api/stats/timeline").json()
        months = timeline["months"]
        assert months and all("-" in m["month"] for m in months)
        cats = client.get("/api/stats/categories").json()["categories"]
        assert {c["category"] for c in cats} == {"portrait", "landscape"}
        corr = client.get("/api/stats/correlations").json()
        assert "aesthetic" in corr["correlation_with_aggregate"]
        # reference-shape extensions (stats.py:452-476): yearly, day x hour
        # heatmap (day 0 = Sunday), top days
        assert timeline["yearly"] and timeline["yearly"][0]["year"] == "2026"
        assert sum(y["count"] for y in timeline["yearly"]) == 12
        heat = timeline["heatmap"]
        assert heat and all(0 <= c["day"] < 7 and 0 <= c["hour"] < 24
                            for c in heat)
        assert sum(c["count"] for c in heat) == 12  # all rows stamped 12:00
        assert all(c["hour"] == 12 for c in heat)
        assert timeline["top_days"][0]["count"] >= 1
        assert "-" in timeline["top_days"][0]["date"]

    def test_scatter(self, client):
        data = client.get("/api/stats/scatter",
                          params={"x": "aesthetic", "y": "aggregate"}).json()
        assert data["samples"] == 12
        assert len(data["points"]) == 12
        # seeded aesthetic/aggregate are jointly monotone -> r == 1
        assert data["r"] == pytest.approx(1.0, abs=1e-3)
        # whitelist guard
        assert client.get("/api/stats/scatter",
                          params={"x": "path"}).status_code == 400
        # drill-down filter applies
        portrait = client.get("/api/stats/scatter",
                              params={"category": "portrait"}).json()
        assert portrait["samples"] == 4
        # deterministic sampling order
        again = client.get("/api/stats/scatter",
                           params={"x": "aesthetic", "y": "aggregate"}).json()
        assert again["points"] == data["points"]

    def test_update_weights_roundtrip(self, client):
        res = client.post("/api/stats/update_weights",
                          json={"category": "landscape",
                                "weights": {"aesthetic_percent": 40,
                                            "composition_percent": 20}})
        assert res.status_code == 200
        total = sum(v for k, v in res.json()["weights"].items()
                    if k.endswith("_percent"))
        assert total == 100  # auto-normalized


class TestThumbnails:
    def test_etag_304(self, client):
        res = client.get("/api/thumbnail/pics/img00.jpg")
        assert res.status_code == 200
        assert res.headers["Content-Type"] == "image/jpeg"
        etag = res.headers["ETag"]
        res2 = client.get("/api/thumbnail/pics/img00.jpg",
                          headers={"If-None-Match": etag})
        assert res2.status_code == 304

    def test_resize_and_missing(self, client):
        res = client.get("/api/thumbnail/pics/img00.jpg", params={"size": 32})
        assert res.status_code == 200
        assert client.get("/api/thumbnail/nope.jpg").status_code == 404

    def test_person_thumbnail(self, client):
        assert client.get("/api/person_thumbnail/1").status_code == 200


class TestPersons:
    def test_list_and_detail(self, client):
        persons = client.get("/api/persons").json()["persons"]
        assert persons[0]["name"] == "Alice"
        detail = client.get("/api/persons/1").json()
        assert len(detail["photos"]) == 2
        assert detail["share_token"]

    def test_share_token_flow(self, client):
        token = client.get("/api/persons/1").json()["share_token"]
        ok = client.get("/api/shared/person/1", params={"token": token})
        assert ok.status_code == 200
        bad = client.get("/api/shared/person/1", params={"token": "wrong"})
        assert bad.status_code == 403

    def test_rename_merge_delete(self, client):
        assert client.post("/api/persons/1/rename",
                           json={"name": "Alicia"}).status_code == 200
        assert client.get("/api/persons/1").json()["person"]["name"] == "Alicia"
        assert client.delete("/api/persons/999").status_code == 404

    def test_rating_favorite(self, client):
        res = client.post("/api/photos/rating",
                          json={"path": "/pics/img00.jpg", "rating": 5})
        assert res.status_code == 200
        assert client.post("/api/photos/rating",
                           json={"path": "/pics/img00.jpg",
                                 "rating": 9}).status_code == 400
        assert client.post("/api/photos/favorite",
                           json={"path": "/pics/img00.jpg",
                                 "favorite": True}).status_code == 200

    def test_faces_for_photo(self, client):
        faces = client.get("/api/faces/pics/img00.jpg").json()["faces"]
        assert len(faces) == 1 and faces[0]["person_name"] == "Alice"


class TestComparison:
    def test_vote_flow(self, client):
        pair = client.get("/api/comparison/next_pair").json()["pair"]
        assert pair and len(pair) == 2
        res = client.post("/api/comparison/submit",
                          json={"photo_a": pair[0]["path"],
                                "photo_b": pair[1]["path"], "winner": "a"})
        assert res.status_code == 200
        assert res.json()["count"] == 1
        history = client.get("/api/comparison/history").json()["history"]
        assert len(history) == 1
        cov = client.get("/api/comparison/coverage").json()
        assert cov["comparisons"] == 1
        assert client.post("/api/comparison/submit",
                           json={"photo_a": "a", "photo_b": "b",
                                 "winner": "zzz"}).status_code == 400

    def test_optimize_insufficient(self, client):
        res = client.post("/api/comparison/optimize", json={})
        assert res.status_code == 400

    def test_photo_metrics(self, client):
        res = client.get("/api/comparison/photo_metrics",
                         params={"paths": "/pics/img00.jpg,/pics/img01.jpg"})
        assert res.status_code == 200
        data = res.json()
        assert set(data) == {"/pics/img00.jpg", "/pics/img01.jpg"}
        assert "aesthetic" in data["/pics/img00.jpg"]
        assert client.get("/api/comparison/photo_metrics").status_code == 400
        assert client.get("/api/comparison/photo_metrics",
                          params={"paths": "a,b,c"}).status_code == 400

    def test_override_category(self, client):
        res = client.post("/api/comparison/override_category",
                          json={"path": "/pics/img00.jpg",
                                "category": "street"})
        assert res.status_code == 200
        body = res.json()
        assert body["old_category"] == "portrait"
        assert body["new_category"] == "street"
        detail = client.get("/api/comparison/photo_metrics",
                            params={"paths": "/pics/img00.jpg"}).json()
        assert detail["/pics/img00.jpg"]["category"] == "street"
        assert client.post("/api/comparison/override_category",
                           json={"path": "/pics/img00.jpg",
                                 "category": "nope"}).status_code == 400
        assert client.post("/api/comparison/override_category",
                           json={"path": "/nope.jpg",
                                 "category": "street"}).status_code == 404

    def test_suggest_filters(self, client):
        # portrait photo -> macro (requires macro-ish tags): conflicts
        res = client.post("/api/comparison/suggest_filters",
                          json={"path": "/pics/img00.jpg",
                                "target_category": "silhouette"})
        assert res.status_code == 200
        body = res.json()
        assert body["target_category"] == "silhouette"
        assert isinstance(body["conflicts"], list)
        assert body["conflicts"], "silhouette requires is_silhouette"
        assert not body["no_conflicts"]
        assert client.post("/api/comparison/suggest_filters",
                           json={"path": "/pics/img00.jpg",
                                 "target_category": "nope"}).status_code == 404

    def test_reset(self, client):
        pair = client.get("/api/comparison/next_pair").json()["pair"]
        client.post("/api/comparison/submit",
                    json={"photo_a": pair[0]["path"],
                          "photo_b": pair[1]["path"], "winner": "a"})
        res = client.post("/api/comparison/reset", json={})
        assert res.status_code == 200
        assert client.get("/api/comparison/coverage").json()["comparisons"] == 0

    def test_learned_weights_insufficient(self, client):
        res = client.get("/api/comparison/learned_weights")
        assert res.status_code == 200
        body = res.json()
        assert body["available"] is False
        assert body["min_required"] > 0

    def test_confidence_insufficient(self, client):
        res = client.get("/api/comparison/confidence")
        assert res.status_code == 200
        assert res.json()["available"] is False

    def test_recalculate(self, client):
        res = client.post("/api/recalculate", json={})
        assert res.status_code == 200
        assert res.json()["photos_recomputed"] == 12


class TestLearnedWeightsWithVotes:
    def test_learned_weights_and_confidence(self, client):
        """Seed enough decisive votes for the optimizer to run end-to-end."""
        import itertools

        paths = [f"/pics/img{i:02d}.jpg" for i in range(12)]
        pairs = list(itertools.combinations(paths, 2))[:55]
        for a, b in pairs:
            # prefer the higher-index photo (aggregates ascend with index)
            client.post("/api/comparison/submit",
                        json={"photo_a": a, "photo_b": b, "winner": "b"})
        res = client.get("/api/comparison/learned_weights").json()
        assert res["available"] is True
        assert abs(sum(res["suggested_weights"].values()) - 100) <= 2
        assert res["comparisons_used"] == 55
        assert 0 <= res["accuracy_after"] <= 1

        cv = client.get("/api/comparison/learned_weights",
                        params={"use_cv": "true"}).json()
        assert cv["available"] is True
        assert cv["method"] == "cross_validated"
        assert len(cv["fold_results"]) == 5
        assert 0 <= cv["cv_accuracy"] <= 1

        conf = client.get("/api/comparison/confidence",
                          params={"n_bootstrap": 16}).json()
        assert conf["available"] is True
        assert conf["n_bootstrap"] == 16
        for key, lo in conf["lower_bounds"].items():
            assert lo <= conf["upper_bounds"][key]


class TestPersonBatchOps:
    def _add_person(self, db, pid, n_faces=1):
        import numpy as np

        rng = np.random.default_rng(pid)
        emb = rng.standard_normal(512).astype(np.float32)
        emb /= np.linalg.norm(emb)
        with get_connection(db) as conn:
            conn.execute("INSERT INTO persons (id, name, face_count, centroid)"
                         " VALUES (?, ?, ?, ?)",
                         (pid, f"P{pid}", n_faces, emb.tobytes()))
            for i in range(n_faces):
                conn.execute(
                    "INSERT INTO faces (photo_path, face_index, embedding,"
                    " confidence, person_id) VALUES (?, ?, ?, 0.9, ?)",
                    (f"/pics/img{(pid + i) % 12:02d}.jpg", pid * 10 + i,
                     emb.tobytes(), pid))

    def test_merge_batch(self, client, seeded_db):
        self._add_person(seeded_db, 2)
        self._add_person(seeded_db, 3)
        res = client.post("/api/persons/merge_batch",
                          json={"target_id": 1, "source_ids": [2, 3]})
        assert res.status_code == 200
        assert res.json()["new_count"] == 4  # 2 original + 2 merged
        assert client.post("/api/persons/merge_batch",
                           json={"target_id": 1,
                                 "source_ids": [1]}).status_code == 400

    def test_delete_batch(self, client, seeded_db):
        self._add_person(seeded_db, 4)
        self._add_person(seeded_db, 5)
        res = client.post("/api/persons/delete_batch",
                          json={"person_ids": [4, 5]})
        assert res.status_code == 200
        assert res.json()["deleted_count"] == 2
        persons = client.get("/api/persons").json()["persons"]
        assert {p["id"] for p in persons} == {1}

    def test_avatar(self, client, seeded_db):
        with get_connection(seeded_db) as conn:
            face_id = conn.execute(
                "SELECT id FROM faces WHERE person_id = 1").fetchone()[0]
        res = client.post("/api/persons/1/avatar", json={"face_id": face_id})
        assert res.status_code == 200
        with get_connection(seeded_db) as conn:
            rep = conn.execute("SELECT representative_face_id FROM persons"
                               " WHERE id = 1").fetchone()[0]
        assert rep == face_id
        assert client.post("/api/persons/1/avatar",
                           json={"face_id": 9999}).status_code == 404

    def test_share_token_endpoint(self, client):
        res = client.get("/api/persons/1/share-token")
        assert res.status_code == 200
        token = res.json()["token"]
        assert client.get("/api/shared/person/1",
                          params={"token": token}).status_code == 200

    def test_person_faces(self, client):
        faces = client.get("/api/persons/1/faces").json()["faces"]
        assert len(faces) == 2

    def test_assign_and_unassign(self, client, seeded_db):
        with get_connection(seeded_db) as conn:
            conn.execute(
                "INSERT INTO faces (photo_path, face_index, embedding,"
                " confidence, person_id) VALUES ('/pics/img06.jpg', 0, ?,"
                " 0.8, NULL)",
                (b"\x00" * 2048,))
        res = client.post("/api/photos/assign_all_faces",
                          json={"path": "/pics/img06.jpg", "person_id": 1})
        assert res.status_code == 200
        assert res.json()["assigned_count"] == 1
        res = client.post("/api/photos/unassign_person",
                          json={"path": "/pics/img06.jpg", "person_id": 1})
        assert res.status_code == 200
        assert res.json()["person_deleted"] is False


class TestCategoryStats:
    def test_category_correlations(self, client):
        res = client.get("/api/stats/category_correlations")
        assert res.status_code == 200
        body = res.json()
        assert "correlations" in body
        assert set(body["dimensions"]) >= {"aesthetic", "composition"}
        assert "portrait" in body["configured_weights"]

    def test_category_metrics(self, client):
        res = client.get("/api/stats/category_metrics",
                         params={"category": "landscape"})
        assert res.status_code == 200
        body = res.json()
        assert body["count"] == 8
        assert len(body["metrics"]["aesthetic"]) == 8
        assert client.get("/api/stats/category_metrics").status_code == 400

    def test_category_overlap(self, client):
        res = client.get("/api/stats/category_overlap")
        assert res.status_code == 200
        body = res.json()
        assert body["total"] == 12
        assert any(c["name"] == "default" for c in body["per_category"])


class TestSystem:
    def test_filter_options(self, client):
        opts = client.get("/api/filter_options").json()
        assert "CamA" in opts["cameras"]
        assert "sunset" in opts["tags"]
        assert opts["date_range"]["min"]

    def test_i18n(self, client):
        langs = client.get("/api/i18n/languages").json()["languages"]
        assert "fr" in langs
        fr = client.get("/api/i18n/fr").json()
        assert fr["language"] == "fr"
        assert fr["catalog"]["nav.gallery"] == "Galerie"
        # unknown language falls back to english
        assert client.get("/api/i18n/xx").json()["language"] == "en"

    def test_auth_open_instance(self, client):
        me = client.get("/api/auth/me").json()
        assert me["role"] == "admin" and not me["auth_required"]

    def test_download(self, client):
        res = client.get("/api/download", params={"format": "csv"})
        assert res.status_code == 200
        assert b"aggregate" in res.content

    def test_validate(self, client):
        checks = client.get("/api/validate").json()["checks"]
        assert len(checks) == 10
        names = {c["name"] for c in checks}
        assert "score_ranges" in names and "referential_integrity" in names

    def test_face_thumbnail_on_the_fly_crop(self, client):
        # a face row without a stored blob crops live from the photo
        # thumbnail per viewer.face_thumbnails (reference
        # thumbnails.py:145-165); tiny bboxes under min_crop_size_px 404
        import numpy as np
        from facet_tpu.db.connection import get_connection
        emb = np.zeros(512, np.float32).tobytes()
        with get_connection(client.app.ctx.config.db_path) as conn:
            conn.execute(
                "INSERT INTO faces (photo_path, face_index, embedding,"
                " bbox_x1, bbox_y1, bbox_x2, bbox_y2, confidence)"
                " VALUES ('/pics/img04.jpg', 0, ?, 4, 4, 40, 36, 0.8)",
                (emb,))
            big = conn.execute("SELECT last_insert_rowid()").fetchone()[0]
            conn.execute(
                "INSERT INTO faces (photo_path, face_index, embedding,"
                " bbox_x1, bbox_y1, bbox_x2, bbox_y2, confidence)"
                " VALUES ('/pics/img04.jpg', 1, ?, 4, 4, 6, 6, 0.8)",
                (emb,))
            tiny = conn.execute("SELECT last_insert_rowid()").fetchone()[0]
        res = client.get(f"/api/face_thumbnail/{big}")
        assert res.status_code == 200 and res.content[:2] == b"\xff\xd8"
        assert client.get(f"/api/face_thumbnail/{tiny}").status_code == 404

    def test_low_light_cutoff_from_config(self, client):
        # seeded mean_luminance is 0.5 everywhere -> empty at cutoff 0.2,
        # everything at 0.9
        assert client.get("/api/type_counts").json()["low_light"] == 0
        client.app.ctx.config.viewer.setdefault("photo_types", {})[
            "low_light_max_luminance"] = 0.9
        assert client.get("/api/type_counts").json()["low_light"] == 12
        data = client.get("/api/photos",
                          params={"type": "low_light",
                                  "hide_blinks": "false"}).json()
        assert data["total"] == 12

    def test_merge_pair_unknown_target(self, client):
        assert client.post("/api/persons/merge/1/999").status_code == 404

    def test_reference_signature_aliases(self, client):
        # GET /api/photo/faces?path= and POST /api/persons/merge/{src}/{dst}
        faces = client.get("/api/photo/faces",
                           params={"path": "/pics/img00.jpg"}).json()["faces"]
        assert faces and faces[0]["person_name"] == "Alice"
        # create a second person, then merge it into Alice via the pair form
        import numpy as np
        from facet_tpu.db.connection import get_connection
        with get_connection(client.app.ctx.config.db_path) as conn:
            emb = np.zeros(512, np.float32); emb[0] = 1.0
            conn.execute("INSERT INTO persons (id, name, face_count, centroid)"
                         " VALUES (7, 'Bob', 1, ?)", (emb.tobytes(),))
            conn.execute("UPDATE faces SET person_id = 7"
                         " WHERE photo_path = '/pics/img01.jpg'")
        res = client.post("/api/persons/merge/7/1")
        assert res.status_code == 200 and res.json()["kept"] == 1
        persons = client.get("/api/persons").json()["persons"]
        assert [p["id"] for p in persons] == [1]

    def test_thumbnail_query_param_form(self, client):
        # the reference's GET /api/thumbnail?path= signature works too
        res = client.get("/api/thumbnail",
                         params={"path": "/pics/img00.jpg", "size": 64})
        assert res.status_code == 200
        assert res.content[:2] == b"\xff\xd8"    # JPEG magic
        assert client.get("/api/thumbnail").status_code == 400
        assert client.get("/api/image").status_code == 400

    def test_scan_directories_disabled(self, client):
        # scan feature is off in the default config
        assert client.get("/api/scan/directories").status_code == 403

    def test_scan_directories(self, seeded_db, tmp_config):
        import json as _json

        from facet_tpu.api import create_app
        from facet_tpu.web import TestClient

        with open(tmp_config) as fh:
            cfg = _json.load(fh)
        cfg["viewer"]["features"] = {"scan": True}
        cfg["viewer"]["scan_directories"] = ["/pics", "/more"]
        with open(tmp_config, "w") as fh:
            _json.dump(cfg, fh)
        client = TestClient(create_app(db_path=seeded_db,
                                       config_path=tmp_config))
        dirs = client.get("/api/scan/directories").json()["directories"]
        assert [d["path"] for d in dirs] == ["/pics", "/more"]


class TestStatsDrilldown:
    """date_from/date_to/category filters on the stats endpoints
    (reference stats.py threads _stats_filter_where through all 15)."""

    def test_overview_by_category(self, client):
        full = client.get("/api/stats/overview").json()
        portraits = client.get("/api/stats/overview",
                               params={"category": "portrait"}).json()
        assert portraits["total_photos"] == 4 < full["total_photos"]
        assert portraits["scored_photos"] == 4

    def test_overview_by_date(self, client):
        early = client.get("/api/stats/overview",
                           params={"date_from": "2026-01-01",
                                   "date_to": "2026-03-31"}).json()
        assert 0 < early["total_photos"] < 12

    def test_gear_and_distribution_filtered(self, client):
        gear = client.get("/api/stats/gear",
                          params={"category": "portrait"}).json()
        assert sum(c["count"] for c in gear["cameras"]) == 4
        dist = client.get("/api/stats/score_distribution",
                          params={"category": "portrait"}).json()
        assert sum(dist["counts"]) == 4
        timeline = client.get("/api/stats/timeline",
                              params={"category": "portrait"}).json()
        assert sum(m["count"] for m in timeline["months"]) == 4
        settings = client.get("/api/stats/settings",
                              params={"category": "portrait"}).json()
        assert sum(v["count"] for v in settings["iso"]) == 4


class TestPhotoTypesConfig:
    """viewer.photo_types drives the top-picks score, threshold and
    face-ratio cutoff (reference api/top_picks.py:9-41, types.py:53-60)."""

    def test_top_picks_threshold_filters(self, client):
        counts = client.get("/api/type_counts").json()
        # seeded aggregates run 4.0..9.5; face rows only on low scorers,
        # so the no-face blend (agg*.2 + aes*.44 + comp*.36) decides
        data = client.get("/api/photos",
                          params={"type": "top_picks",
                                  "hide_blinks": "false"}).json()
        assert counts["top_picks"] == data["total"]
        # only photos clearing the blended-score cutoff are members
        assert 0 < data["total"] < 12
        # ordered by the blended score, not raw aggregate
        assert data["photos"][0]["aggregate"] >= data["photos"][-1]["aggregate"]

    def test_top_picks_config_override(self, seeded_db, tmp_config):
        import json as _json

        from facet_tpu.api import create_app
        from facet_tpu.web import TestClient

        with open(tmp_config) as fh:
            cfg = _json.load(fh)
        cfg["viewer"]["photo_types"] = {
            "top_picks_min_score": 0,      # everything scored qualifies
            "top_picks_weights": {"aggregate_percent": 100,
                                  "aesthetic_percent": 0,
                                  "composition_percent": 0,
                                  "face_quality_percent": 0},
        }
        with open(tmp_config, "w") as fh:
            _json.dump(cfg, fh)
        client = TestClient(create_app(db_path=seeded_db,
                                       config_path=tmp_config))
        data = client.get("/api/photos",
                          params={"type": "top_picks",
                                  "hide_blinks": "false"}).json()
        assert data["total"] == 12     # threshold 0 admits all
        scores = [p["aggregate"] for p in data["photos"]]
        assert scores == sorted(scores, reverse=True)  # pure-aggregate order

    def test_config_exposes_viewer_blocks(self, client):
        cfg = client.get("/api/config").json()
        assert cfg["display"]["tags_per_photo"] == 4
        assert cfg["notification_duration_ms"] == 2000
        assert cfg["photo_types"]["top_picks_min_score"] == 7


class TestClientFlows:
    """HTTP-level replays of the viewer's feature flows (client/app.js):
    each test issues exactly the request sequence the SPA drives, so the
    contract the store depends on is exercised end-to-end."""

    def test_selection_favorite_flow(self, client):
        # select two cards -> "Favorite selected" -> favorites-only filter
        picked = ["/pics/img06.jpg", "/pics/img07.jpg"]
        for path in picked:
            assert client.post("/api/photos/favorite",
                               json={"path": path,
                                     "favorite": True}).status_code == 200
        favs = client.get("/api/photos",
                          params={"favorites_only": "true"}).json()
        assert sorted(p["path"] for p in favs["photos"]) == picked
        # un-favoriting drops it from the filter again
        client.post("/api/photos/favorite",
                    json={"path": picked[0], "favorite": False})
        favs = client.get("/api/photos",
                          params={"favorites_only": "true"}).json()
        assert [p["path"] for p in favs["photos"]] == [picked[1]]

    def test_face_assignment_flow(self, client):
        # the modal faces panel: chip-x unassigns the person, the dropdown
        # re-assigns the now-unidentified face
        path = "/pics/img00.jpg"
        faces = client.get("/api/faces" + path).json()["faces"]
        assert faces and faces[0]["person_id"] == 1
        assert faces[0]["person_name"] == "Alice"

        res = client.post("/api/photos/unassign_person",
                          json={"path": path, "person_id": 1})
        assert res.status_code == 200
        faces = client.get("/api/faces" + path).json()["faces"]
        assert faces[0]["person_id"] is None

        # the dropdown lists persons, then posts the assignment
        persons = client.get("/api/persons").json()["persons"]
        assert any(p["id"] == 1 for p in persons)
        res = client.post(f"/api/faces/{faces[0]['id']}/assign",
                          json={"person_id": 1})
        assert res.status_code == 200
        faces = client.get("/api/faces" + path).json()["faces"]
        assert faces[0]["person_id"] == 1 and faces[0]["person_name"] == "Alice"

    def test_assign_all_faces_flow(self, client):
        # unassign one photo (Alice keeps her other face), then the
        # "assign all unidentified faces" dropdown restores it in bulk
        path = "/pics/img00.jpg"
        client.post("/api/photos/unassign_person",
                    json={"path": path, "person_id": 1})
        assert client.get("/api/faces" + path).json()["faces"][0]["person_id"] is None
        res = client.post("/api/photos/assign_all_faces",
                          json={"path": path, "person_id": 1})
        assert res.status_code == 200
        faces = client.get("/api/faces" + path).json()["faces"]
        assert all(f["person_id"] == 1 for f in faces)
        # person stats were refreshed along the way
        alice = [p for p in client.get("/api/persons").json()["persons"]
                 if p["id"] == 1][0]
        assert alice["photo_count"] == 2

    def test_weights_preview_strip(self, client):
        # the weight editor re-scores the top photos under draft weights
        top = client.get("/api/photos", params={"page_size": 4}).json()
        paths = [p["path"] for p in top["photos"]]
        res = client.post("/api/comparison/preview_score",
                          json={"paths": paths,
                                "weights": {"aesthetic": 100}})
        assert res.status_code == 200
        previews = res.json()["previews"]
        assert [p["path"] for p in previews] == paths
        # weights {aesthetic: 100} -> preview equals the aesthetic value
        for prev, photo in zip(previews, top["photos"]):
            assert abs(prev["preview_score"] - photo["aesthetic"]) < 0.01
            assert prev["current_score"] == photo["aggregate"]
        # single-path shape is unchanged
        one = client.post("/api/comparison/preview_score",
                          json={"path": paths[0],
                                "weights": {"aesthetic": 100}}).json()
        assert one["preview_score"] == previews[0]["preview_score"]
        assert "current_aggregate" in one
        # unknown path in the strip 404s; oversized strips are refused
        assert client.post("/api/comparison/preview_score",
                           json={"paths": ["/nope.jpg"],
                                 "weights": {"aesthetic": 1}}).status_code == 404
        assert client.post("/api/comparison/preview_score",
                           json={"paths": ["/x"] * 101,
                                 "weights": {"aesthetic": 1}}).status_code == 400

    def test_vote_history_edit_delete_flow(self, client):
        # vote, then re-judge it from the history panel, then delete it
        a, b = "/pics/img04.jpg", "/pics/img05.jpg"
        res = client.post("/api/comparison/submit",
                          json={"photo_a": a, "photo_b": b, "winner": "a"})
        assert res.status_code == 200
        hist = client.get("/api/comparison/history").json()["history"]
        assert hist and hist[0]["winner"] == "a"
        vote_id = hist[0]["id"]
        assert client.put(f"/api/comparison/{vote_id}",
                          json={"winner": "b"}).status_code == 200
        hist = client.get("/api/comparison/history").json()["history"]
        assert hist[0]["winner"] == "b"
        assert client.delete(f"/api/comparison/{vote_id}").status_code == 200
        assert client.get("/api/comparison/history").json()["history"] == []

    def test_category_override_from_modal(self, client):
        res = client.post("/api/comparison/override_category",
                          json={"path": "/pics/img06.jpg",
                                "category": "portrait"})
        assert res.status_code == 200
        body = res.json()
        assert body["old_category"] == "landscape"
        assert body["new_category"] == "portrait"
        got = client.get("/api/photos",
                         params={"category": "portrait",
                                 "hide_blinks": "false"}).json()
        assert any(p["path"] == "/pics/img06.jpg" for p in got["photos"])

    def test_category_scoped_voting(self, client):
        # the comparison category selector: pairs come from the category,
        # votes record it, history shows it
        pair = client.get("/api/comparison/next_pair",
                          params={"category": "portrait"}).json()["pair"]
        assert pair and len(pair) == 2
        res = client.post("/api/comparison/submit",
                          json={"photo_a": pair[0]["path"],
                                "photo_b": pair[1]["path"],
                                "winner": "a", "category": "portrait"})
        assert res.status_code == 200
        hist = client.get("/api/comparison/history").json()["history"]
        assert hist[0]["category"] == "portrait"

    def test_reference_param_spellings(self, client):
        # the reference client's spellings work verbatim
        base = {"hide_blinks": "false"}
        assert client.get("/api/photos", params=dict(
            base, person="1")).json()["total"] == 2
        assert client.get("/api/photos", params=dict(
            base, min_aggregate="8.0")).json()["total"] == 4
        assert client.get("/api/photos", params=dict(
            base, is_monochrome="true")).json()["total"] == 1
        assert client.get("/api/photos", params=dict(
            base, aperture="2.8")).json()["total"] == 12
        assert client.get("/api/photos", params=dict(
            base, aperture="5.6")).json()["total"] == 0
        # ROUND matching: a dropdown value of 2.80001 still hits f/2.8 rows
        assert client.get("/api/photos", params=dict(
            base, aperture="2.80001")).json()["total"] == 12
        # comma-separated person lists AND per id (reference semantics)
        assert client.get("/api/photos", params=dict(
            base, person="1,1")).json()["total"] == 2
        assert client.get("/api/photos", params=dict(
            base, person_id="1,424242")).json()["total"] == 0
        assert client.get("/api/photos", params=dict(
            base, person_id="junk")).status_code == 400
        assert client.get("/api/photos", params=dict(
            base, max_luminance="0.4")).json()["total"] == 0
        assert client.get("/api/photos", params=dict(
            base, min_luminance="0.4")).json()["total"] == 12
        # show_rejected flips the default hide and shows ONLY rejected
        client.post("/api/photos/rejected",
                    json={"path": "/pics/img09.jpg", "rejected": True})
        only = client.get("/api/photos", params=dict(
            base, show_rejected="true")).json()
        assert [p["path"] for p in only["photos"]] == ["/pics/img09.jpg"]
        # top_picks_filter matches the top_picks type
        flt = client.get("/api/photos", params=dict(
            base, top_picks_filter="true")).json()["total"]
        typ = client.get("/api/photos", params=dict(
            base, type="top_picks")).json()["total"]
        assert flt == typ > 0
        # the long tail of reference range params binds to real columns
        for extreme in ({"min_exposure": "0"}, {"max_face_count": "99"},
                        {"min_composition": "0"}, {"max_dynamic_range": "99"},
                        {"min_face_ratio": "0"}, {"max_noise": "1e9"},
                        {"min_isolation": "-1e9"},
                        {"min_histogram_spread": "-1"}):
            res = client.get("/api/photos", params=dict(base, **extreme))
            assert res.status_code == 200, extreme

    def test_require_and_exclude_tag_lists(self, client, seeded_db):
        # give one sunset photo an extra 'beach' tag
        with get_connection(seeded_db) as conn:
            conn.execute("INSERT INTO photo_tags (photo_path, tag)"
                         " VALUES ('/pics/img04.jpg', 'beach')")
        # any-of: sunset OR nonexistent matches all 8 sunset photos
        got = client.get("/api/photos",
                         params={"require_tags": "sunset, nosuchtag"}).json()
        assert got["total"] == 8
        # exclusion subtracts the beach photo
        got = client.get("/api/photos",
                         params={"require_tags": "sunset",
                                 "exclude_tags": "beach"}).json()
        assert got["total"] == 7
        assert all(p["path"] != "/pics/img04.jpg" for p in got["photos"])

    def test_filter_by_person_chip(self, client):
        # clicking a person chip filters the gallery by person_id
        data = client.get("/api/photos",
                          params={"person_id": 1,
                                  "hide_blinks": "false"}).json()
        assert data["total"] == 2
        assert all(p["path"].startswith("/pics/img0") for p in data["photos"])


class TestAuthModes:
    def test_token_tampering_rejected(self, seeded_db, tmp_config):
        """Signature edits, payload role escalation, and bogus thumbnail
        token params must all 401."""
        import base64
        import json as jsonlib

        with open(tmp_config) as fh:
            raw = jsonlib.load(fh)
        raw["viewer"]["password"] = "hunter2"
        with open(tmp_config, "w") as fh:
            jsonlib.dump(raw, fh)

        from facet_tpu.api import create_app
        from facet_tpu.web import TestClient

        client = TestClient(create_app(db_path=seeded_db,
                                       config_path=tmp_config))
        token = client.post("/api/auth/login",
                            json={"password": "hunter2"}).json()["token"]
        head, payload, sig = token.split(".")

        def get(tok):
            return client.get("/api/photos",
                              headers={"Authorization": f"Bearer {tok}"})

        assert get(token).status_code == 200
        assert get(f"{head}.{payload}.AAAA{sig[4:]}").status_code == 401
        body = jsonlib.loads(base64.urlsafe_b64decode(payload + "=="))
        body["role"] = "superadmin"
        forged = base64.urlsafe_b64encode(
            jsonlib.dumps(body).encode()).decode().rstrip("=")
        assert get(f"{head}.{forged}.{sig}").status_code == 401
        # the <img> token param path enforces the same check
        assert client.get("/api/thumbnail/pics/img00.jpg",
                          params={"token": "junk"}).status_code == 401
        assert client.get("/api/thumbnail/pics/img00.jpg",
                          params={"token": token}).status_code == 200

    def test_password_mode(self, seeded_db, tmp_config):
        import json as jsonlib

        with open(tmp_config) as fh:
            raw = jsonlib.load(fh)
        raw["viewer"]["password"] = "hunter2"
        with open(tmp_config, "w") as fh:
            jsonlib.dump(raw, fh)

        from facet_tpu.api import create_app
        from facet_tpu.web import TestClient

        client = TestClient(create_app(db_path=seeded_db, config_path=tmp_config))
        assert client.get("/api/photos").status_code == 401
        bad = client.post("/api/auth/login", json={"password": "wrong"})
        assert bad.status_code == 401
        ok = client.post("/api/auth/login", json={"password": "hunter2"})
        token = ok.json()["token"]
        res = client.get("/api/photos",
                         headers={"Authorization": f"Bearer {token}"})
        assert res.status_code == 200

    def test_multi_user_roles(self, seeded_db, tmp_config):
        import json as jsonlib

        from facet_tpu.api.config import APIConfig

        with open(tmp_config) as fh:
            raw = jsonlib.load(fh)
        raw["users"] = {
            "bob": {"password_hash": APIConfig.hash_password("pw"),
                    "role": "user"},
        }
        with open(tmp_config, "w") as fh:
            jsonlib.dump(raw, fh)

        from facet_tpu.api import create_app
        from facet_tpu.web import TestClient

        client = TestClient(create_app(db_path=seeded_db, config_path=tmp_config))
        token = client.post("/api/auth/login",
                            json={"username": "bob", "password": "pw"}).json()["token"]
        auth = {"Authorization": f"Bearer {token}"}
        assert client.get("/api/photos", headers=auth).status_code == 200
        # plain users cannot change weights
        res = client.post("/api/stats/update_weights", headers=auth,
                          json={"category": "default", "weights": {}})
        assert res.status_code == 403

    def test_password_hashing_pbkdf2(self):
        from facet_tpu.api.config import APIConfig

        stored = APIConfig.hash_password("s3cret")
        salt, dk = stored.split(":")
        assert len(salt) == 32 and len(dk) == 64  # 16-byte salt, 32-byte dk
        assert APIConfig.check_password("s3cret", stored)
        assert not APIConfig.check_password("wrong", stored)
        # two hashes of the same password differ (random salt)
        assert APIConfig.hash_password("s3cret") != stored
        # legacy unsalted sha256 hex still verifies
        import hashlib
        legacy = hashlib.sha256(b"old-pw").hexdigest()
        assert APIConfig.check_password("old-pw", legacy)
        assert not APIConfig.check_password("nope", legacy)

    def test_leaked_share_secret_rotated(self, seeded_db, tmp_config):
        import json as jsonlib

        from facet_tpu.api.config import APIConfig, is_leaked_secret

        leaked = ("5b0c56f011ff5342940872bc1d971149"
                  "b5926ddd34a3a6aba9e188fe7e584092")
        assert is_leaked_secret(leaked)
        assert not is_leaked_secret("some-other-secret")
        with open(tmp_config) as fh:
            raw = jsonlib.load(fh)
        raw["share_secret"] = leaked
        with open(tmp_config, "w") as fh:
            jsonlib.dump(raw, fh)
        cfg = APIConfig(db_path=seeded_db, config_path=tmp_config)
        assert cfg.share_secret != leaked


class TestFilterOptionsLazy:
    """The eight per-filter lazy dropdown endpoints
    (reference api/routers/filter_options.py:43-214)."""

    def test_cameras_with_counts(self, client):
        cams = client.get("/api/filter_options/cameras").json()["cameras"]
        assert sorted(map(tuple, cams)) == [("CamA", 6), ("CamB", 6)]

    def test_lenses_with_counts(self, client):
        lenses = client.get("/api/filter_options/lenses").json()["lenses"]
        assert list(map(tuple, lenses)) == [("50mm", 12)]

    def test_categories_with_counts(self, client):
        cats = client.get("/api/filter_options/categories").json()["categories"]
        assert sorted(map(tuple, cats)) == [("landscape", 8), ("portrait", 4)]

    def test_tags_via_photo_tags(self, client):
        tags = client.get("/api/filter_options/tags").json()["tags"]
        assert ("sunset", 8) in set(map(tuple, tags))

    def test_persons_with_photo_counts(self, client):
        persons = client.get("/api/filter_options/persons").json()["persons"]
        assert list(map(tuple, persons)) == [(1, "Alice", 2)]
        # raising the config gate hides small persons — on the live query
        # AND on the cached path (the gate applies to cached rows too)
        ctx = client.app.ctx
        ctx.config.viewer.setdefault("dropdowns", {})["min_photos_for_person"] = 10
        for _ in range(2):       # second hit may serve from the stats cache
            persons = client.get("/api/filter_options/persons").json()["persons"]
            assert persons == []

    def test_apertures_rounded(self, client):
        aps = client.get("/api/filter_options/apertures").json()["apertures"]
        assert list(map(tuple, aps)) == [(2.8, 12)]

    def test_empty_option_families(self, client):
        # composition_pattern / focal_length are unset in the seed library
        assert client.get("/api/filter_options/patterns").json()["patterns"] == []
        assert client.get(
            "/api/filter_options/focal_lengths").json()["focal_lengths"] == []

    def test_stats_cache_fast_path(self, client, seeded_db):
        from facet_tpu.db.stats_cache import refresh_stats_cache

        refresh_stats_cache(seeded_db)
        res = client.get("/api/filter_options/cameras").json()
        assert res["cached"] is True
        assert sorted(map(tuple, res["cameras"])) == [("CamA", 6), ("CamB", 6)]


class TestAuthStatusEdition:
    """/api/auth/status + /api/auth/edition/login
    (reference api/routers/auth.py:71-104)."""

    def test_status_open_instance(self, client):
        st = client.get("/api/auth/status").json()
        assert st["authenticated"] and not st["multi_user"]
        assert not st["edition_enabled"]
        assert st["edition_authenticated"]          # open instance = admin

    def test_edition_login_flow(self, seeded_db, tmp_config):
        import json as jsonlib

        with open(tmp_config) as fh:
            raw = jsonlib.load(fh)
        raw["viewer"]["password"] = "viewpass"
        raw["viewer"]["edition_password"] = "editpass"
        with open(tmp_config, "w") as fh:
            jsonlib.dump(raw, fh)

        from facet_tpu.api import create_app
        from facet_tpu.web import TestClient

        client = TestClient(create_app(db_path=seeded_db,
                                       config_path=tmp_config))
        # first-stage viewer login -> read-only role
        tok = client.post("/api/auth/login",
                          json={"password": "viewpass"}).json()["token"]
        auth = {"Authorization": f"Bearer {tok}"}
        st = client.get("/api/auth/status", headers=auth).json()
        assert st["edition_enabled"] and not st["edition_authenticated"]
        # wrong edition password rejected
        assert client.post("/api/auth/edition/login",
                           json={"password": "nope"}).status_code == 401
        # second-stage edition login -> edit rights
        etok = client.post("/api/auth/edition/login",
                           json={"password": "editpass"}).json()["token"]
        eauth = {"Authorization": f"Bearer {etok}"}
        st = client.get("/api/auth/status", headers=eauth).json()
        assert st["edition_authenticated"]

    def test_edition_login_rejected_in_multi_user(self, seeded_db, tmp_config):
        import json as jsonlib

        from facet_tpu.api.config import APIConfig

        with open(tmp_config) as fh:
            raw = jsonlib.load(fh)
        raw["users"] = {"bob": {"password_hash": APIConfig.hash_password("pw"),
                                "role": "user"}}
        with open(tmp_config, "w") as fh:
            jsonlib.dump(raw, fh)

        from facet_tpu.api import create_app
        from facet_tpu.web import TestClient

        client = TestClient(create_app(db_path=seeded_db,
                                       config_path=tmp_config))
        res = client.post("/api/auth/edition/login",
                          json={"password": "anything"})
        assert res.status_code == 400


class TestComparisonErrorPaths:
    """Error handling on the comparison router's write/learn endpoints."""

    def test_submit_validation(self, client):
        assert client.post("/api/comparison/submit",
                           json={"photo_a": "/pics/img00.jpg"}).status_code == 400
        res = client.post("/api/comparison/submit",
                          json={"photo_a": "/pics/img00.jpg",
                                "photo_b": "/pics/img01.jpg",
                                "winner": "nonsense"})
        assert res.status_code == 400

    def test_optimize_without_votes(self, client):
        res = client.post("/api/comparison/optimize", json={})
        assert res.status_code == 400
        assert "not enough comparisons" in res.json()["detail"]

    def test_learned_weights_without_votes(self, client):
        body = client.get("/api/comparison/learned_weights").json()
        assert body["available"] is False
        assert body["comparisons"] == 0 and body["min_required"] > 0

    def test_snapshot_restore_unknown_id(self, client):
        res = client.post("/api/comparison/snapshots/99999/restore")
        assert res.status_code == 404

    def test_save_snapshot_roundtrip(self, client):
        scoring = client.app.ctx.config.scoring
        before = dict([c for c in scoring.config["categories"]
                       if c["name"] == "portrait"][0]["weights"])
        res = client.post("/api/comparison/snapshots",
                          json={"category": "portrait",
                                "description": "manual checkpoint"})
        assert res.status_code == 200
        sid = res.json()["snapshot_id"]
        listed = client.get("/api/comparison/snapshots",
                            params={"category": "portrait"}).json()["snapshots"]
        assert any(s["id"] == sid and s["description"] == "manual checkpoint"
                   for s in listed)
        # an unfiltered listing contains it too; a bogus category does not
        assert any(s["id"] == sid for s in
                   client.get("/api/comparison/snapshots").json()["snapshots"])
        assert client.get("/api/comparison/snapshots",
                          params={"category": "landscape"}).json()["snapshots"] == []
        # the snapshot stores the RAW '*_percent' block and restores it
        # back into the same vocabulary (a normalized-decimal snapshot
        # would silently corrupt the config on restore)
        restored = client.post(f"/api/comparison/snapshots/{sid}/restore")
        assert restored.status_code == 200
        cfg = client.get("/api/stats/category_weights").json()
        assert cfg["weights"]["portrait"]        # still resolvable
        raw = [c for c in scoring.config["categories"]
               if c["name"] == "portrait"][0]["weights"]
        assert raw == before     # same '*_percent' vocabulary, same values

    def test_save_snapshot_unknown_category(self, client):
        assert client.post("/api/comparison/snapshots",
                           json={"category": "not-a-category"}).status_code == 400

    def test_preview_score_missing_photo(self, client):
        assert client.post("/api/comparison/preview_score",
                           json={"weights": {}}).status_code == 400
        assert client.post("/api/comparison/preview_score",
                           json={"path": "/nope.jpg",
                                 "weights": {}}).status_code == 404

    def test_update_weights_validation(self, client):
        assert client.post("/api/stats/update_weights",
                           json={"weights": {}}).status_code == 400
        res = client.post("/api/stats/update_weights",
                          json={"category": "no_such_category",
                                "weights": {"aesthetic_percent": 50}})
        assert res.status_code == 404


class TestRemainingEndpoints:
    """Direct coverage for the last endpoints without their own tests."""

    def test_comparison_statistics_after_votes(self, client):
        client.post("/api/comparison/submit",
                    json={"photo_a": "/pics/img04.jpg",
                          "photo_b": "/pics/img05.jpg", "winner": "a"})
        client.post("/api/comparison/submit",
                    json={"photo_a": "/pics/img06.jpg",
                          "photo_b": "/pics/img07.jpg", "winner": "tie"})
        stats = client.get("/api/comparison/statistics").json()
        assert stats["comparisons"] == 2
        assert stats["by_winner"].get("a") == 1
        assert stats["by_winner"].get("tie") == 1

    def test_apply_weights_without_learning(self, client):
        res = client.post("/api/comparison/apply_weights", json={})
        assert res.status_code == 400

    def test_merge_suggestions_empty_and_hit(self, client, seeded_db):
        # a single person yields no suggestions
        assert client.get("/api/merge_suggestions").json()["suggestions"] == []
        # a near-identical centroid pair is suggested
        with get_connection(seeded_db) as conn:
            row = conn.execute(
                "SELECT centroid FROM persons WHERE id = 1").fetchone()
            emb = np.frombuffer(row[0], np.float32).copy()
            emb[0] += 1e-3
            emb /= np.linalg.norm(emb)
            conn.execute(
                "INSERT INTO persons (id, name, face_count, centroid)"
                " VALUES (5, 'Alicia', 1, ?)", (emb.tobytes(),))
        sugg = client.get("/api/merge_suggestions").json()["suggestions"]
        assert sugg and set(sugg[0]["person_ids"]) == {1, 5}

    def test_rejected_toggle_hides_photo(self, client):
        assert client.post("/api/photos/rejected",
                           json={"path": "/pics/img08.jpg",
                                 "rejected": True}).status_code == 200
        # hide_rejected defaults true
        data = client.get("/api/photos").json()
        assert all(p["path"] != "/pics/img08.jpg" for p in data["photos"])
        shown = client.get("/api/photos",
                           params={"hide_rejected": "false",
                                   "hide_blinks": "false"}).json()
        assert shown["total"] == 12

    def test_scan_start_gated_and_status(self, client):
        # feature disabled in the default config -> 403; status reports idle
        assert client.post("/api/scan/start",
                           json={"directory": "/pics"}).status_code == 403
        status = client.get("/api/scan/status").json()
        assert status["running"] is False

    def test_stats_recompute(self, client):
        res = client.post("/api/stats/recompute")
        assert res.status_code == 200
        assert res.json()["recomputed"] >= 0


class TestRobustness:
    """Unicode paths, malformed bodies, concurrent access."""

    def test_unicode_photo_path(self, client):
        import io
        from PIL import Image
        from facet_tpu.db.connection import get_connection

        buf = io.BytesIO()
        Image.new("RGB", (64, 48), (9, 99, 199)).save(buf, "JPEG")
        path = "/pics/café ñ 写真.jpg"
        with get_connection(client.app.ctx.config.db_path) as conn:
            conn.execute(
                "INSERT INTO photos (path, filename, aggregate, thumbnail,"
                " is_burst_lead) VALUES (?, ?, 6.0, ?, 1)",
                (path, "café ñ 写真.jpg", buf.getvalue()))
        from urllib.parse import quote
        res = client.get("/api/thumbnail" + quote(path))
        assert res.status_code == 200 and res.content[:2] == b"\xff\xd8"
        res = client.get("/api/faces" + quote(path))
        assert res.status_code == 200
        # ratings roundtrip on the unicode path
        assert client.post("/api/photos/rating",
                           json={"path": path, "rating": 4}).status_code == 200
        got = client.get("/api/photos", params={"search": "café"}).json()
        assert got["total"] == 1 and got["photos"][0]["star_rating"] == 4

    def test_preview_rejects_non_numeric_weights(self, client):
        res = client.post("/api/comparison/preview_score",
                          json={"path": "/pics/img00.jpg",
                                "weights": {"aesthetic": "lots"}})
        assert res.status_code == 400

    def test_malformed_json_body_is_400(self, client):
        res = client.post("/api/photos/rating", data=b"{not json",
                          headers={"Content-Type": "application/json"})
        assert res.status_code == 400

    def test_concurrent_reads_and_writes(self, client):
        import threading

        errors = []

        def reader():
            try:
                for _ in range(8):
                    assert client.get("/api/photos").status_code == 200
                    assert client.get("/api/stats/overview").status_code == 200
            except Exception as exc:     # pragma: no cover
                errors.append(exc)

        def writer():
            try:
                for i in range(8):
                    res = client.post(
                        "/api/photos/rating",
                        json={"path": "/pics/img06.jpg", "rating": i % 5 + 1})
                    assert res.status_code == 200
            except Exception as exc:     # pragma: no cover
                errors.append(exc)

        threads = [threading.Thread(target=f)
                   for f in (reader, reader, writer, writer)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors, errors


class TestGalleryErrorPaths:
    def test_bad_sort_rejected(self, client):
        res = client.get("/api/photos", params={"sort": "evil; DROP TABLE"})
        assert res.status_code == 400

    def test_similar_unknown_photo(self, client):
        res = client.get("/api/similar_photos/unknown/path.jpg")
        assert res.status_code in (200, 404)   # contract: no 500
        if res.status_code == 200:
            assert res.json().get("similar") in ([], None)

    def test_thumbnail_unknown_photo(self, client):
        assert client.get("/api/thumbnail/nope.jpg").status_code == 404

    def test_person_endpoints_unknown_id(self, client):
        assert client.get("/api/persons/424242").status_code == 404
        assert client.post("/api/persons/424242/rename",
                           json={"name": "x"}).status_code in (200, 404)
        assert client.post("/api/persons/424242/avatar",
                           json={"face_id": 1}).status_code == 404


class TestRound4SecurityFixes:
    def _app(self, seeded_db, tmp_config, viewer=None, edition=None):
        import json as jsonlib

        with open(tmp_config) as fh:
            raw = jsonlib.load(fh)
        if viewer:
            raw["viewer"]["password"] = viewer
        if edition:
            raw["viewer"]["edition_password"] = edition
        with open(tmp_config, "w") as fh:
            jsonlib.dump(raw, fh)
        from facet_tpu.api import create_app
        from facet_tpu.web import TestClient

        return TestClient(create_app(db_path=seeded_db,
                                     config_path=tmp_config))

    def test_edition_only_mode_rejects_wrong_password(self, seeded_db,
                                                      tmp_config):
        """edition_password set with no viewer password: a wrong or empty
        password must 401, not fall through to an ADMIN token (round-4
        review finding — full auth bypass)."""
        client = self._app(seeded_db, tmp_config, edition="editpass")
        assert client.post("/api/auth/login",
                           json={"password": "wrong"}).status_code == 401
        assert client.post("/api/auth/login",
                           json={"password": ""}).status_code == 401
        ok = client.post("/api/auth/login", json={"password": "editpass"})
        assert ok.status_code == 200

    def test_readonly_viewer_cannot_write_preferences(self, seeded_db,
                                                      tmp_config):
        """Single-user edition mode: the read-only viewer role must not
        mutate the global photos table via rating/favorite/rejected
        (reference require_auth semantics, api/auth.py:141-155)."""
        client = self._app(seeded_db, tmp_config, viewer="viewpass",
                           edition="editpass")
        vtok = client.post("/api/auth/login",
                           json={"password": "viewpass"}).json()["token"]
        vauth = {"Authorization": f"Bearer {vtok}"}
        photo = client.get("/api/photos", headers=vauth).json()["photos"][0]
        for ep, body in (("/api/photos/rating",
                          {"path": photo["path"], "rating": 3}),
                         ("/api/photos/favorite",
                          {"path": photo["path"], "favorite": True}),
                         ("/api/photos/rejected",
                          {"path": photo["path"], "rejected": True})):
            assert client.post(ep, json=body,
                               headers=vauth).status_code == 403, ep
        # the editor (admin) still can
        etok = client.post("/api/auth/login",
                           json={"password": "editpass"}).json()["token"]
        eauth = {"Authorization": f"Bearer {etok}"}
        assert client.post("/api/photos/rating",
                           json={"path": photo["path"], "rating": 3},
                           headers=eauth).status_code == 200

    def test_share_token_hidden_from_readonly_viewer(self, seeded_db,
                                                     tmp_config):
        from facet_tpu.db.connection import get_connection

        with get_connection(seeded_db) as conn:
            conn.execute("INSERT INTO persons (id, name) VALUES (71, 'p')")
        client = self._app(seeded_db, tmp_config, viewer="viewpass",
                           edition="editpass")
        vtok = client.post("/api/auth/login",
                           json={"password": "viewpass"}).json()["token"]
        got = client.get("/api/persons/71",
                         headers={"Authorization": f"Bearer {vtok}"}).json()
        assert "share_token" not in got
        etok = client.post("/api/auth/login",
                           json={"password": "editpass"}).json()["token"]
        got = client.get("/api/persons/71",
                         headers={"Authorization": f"Bearer {etok}"}).json()
        assert "share_token" in got

    def test_assign_face_validates_person(self, client, seeded_db):
        from facet_tpu.db.connection import get_connection

        with get_connection(seeded_db) as conn:
            conn.execute(
                "INSERT INTO faces (id, photo_path, face_index, embedding)"
                " SELECT 903, path, 77, x'00' FROM photos LIMIT 1")
        assert client.post("/api/faces/903/assign",
                           json={}).status_code == 400
        assert client.post("/api/faces/903/assign",
                           json={"person_id": 99999}).status_code == 404


class TestTypeViewsNotSelfContradictory:
    def test_type_views_yield_rows_despite_hide_defaults(self, client,
                                                         seeded_db):
        """type=blinks/bursts/rejected/duplicates must not be nulled by
        the config-default hide flags (round-4 review finding: the badge
        said N, the view showed none)."""
        from facet_tpu.db.connection import get_connection

        with get_connection(seeded_db) as conn:
            # img03 is seeded as a blink and img05 as monochrome; pick
            # rows whose OTHER flags don't interact with the hide filters
            paths = [r[0] for r in conn.execute(
                "SELECT path FROM photos WHERE is_blink = 0"
                " ORDER BY path LIMIT 4")]
            conn.execute("UPDATE photos SET is_blink = 1 WHERE path = ?",
                         (paths[0],))
            conn.execute("UPDATE photos SET is_burst_lead = 0 WHERE path = ?",
                         (paths[1],))
            conn.execute("UPDATE photos SET is_rejected = 1 WHERE path = ?",
                         (paths[2],))
            conn.execute(
                "UPDATE photos SET duplicate_group_id = 5,"
                " is_duplicate_lead = 0 WHERE path = ?", (paths[3],))
        for ptype, path in (("blinks", paths[0]), ("bursts", paths[1]),
                            ("rejected", paths[2]), ("duplicates", paths[3])):
            got = client.get(f"/api/photos?type={ptype}").json()
            assert any(p["path"] == path for p in got["photos"]), ptype
        # an EXPLICIT contradicting hide flag still wins (reference
        # applies both clauses)
        got = client.get("/api/photos?type=blinks&hide_blinks=1").json()
        assert not any(p["path"] == paths[0] for p in got["photos"])


class TestRound4ScanAndWeightsHardening:
    def test_update_weights_rejects_non_numeric(self, client):
        res = client.post("/api/stats/update_weights", json={
            "category": "portrait",
            "weights": {"aesthetic_percent": "fifty"}})
        assert res.status_code == 400
        # numeric strings coerce (form-encoded clients)
        res = client.post("/api/stats/update_weights", json={
            "category": "portrait",
            "weights": {"aesthetic_percent": "50"}})
        assert res.status_code == 200
        # and the config still loads cleanly afterwards
        assert client.get("/api/stats/category_weights").status_code == 200

    def test_scan_rejects_unlisted_directory(self, seeded_db, tmp_config):
        """An EMPTY scan_directories allowlist rejects every directory
        (reference scan.py:68-73) — it used to mean allow-any."""
        import json as jsonlib

        with open(tmp_config) as fh:
            raw = jsonlib.load(fh)
        raw.setdefault("viewer", {})["features"] = {"scan": True}
        with open(tmp_config, "w") as fh:
            jsonlib.dump(raw, fh)
        from facet_tpu.api import create_app
        from facet_tpu.web import TestClient

        client = TestClient(create_app(db_path=seeded_db,
                                       config_path=tmp_config))
        assert client.post("/api/scan/start",
                           json={"directory": "/etc"}).status_code == 400

    def test_scan_status_requires_role_in_multi_user(self, seeded_db,
                                                     tmp_config):
        import json as jsonlib

        from facet_tpu.api.config import APIConfig

        with open(tmp_config) as fh:
            raw = jsonlib.load(fh)
        raw["users"] = {
            "eve": {"password_hash": APIConfig.hash_password("pw"),
                    "role": "user"}}
        with open(tmp_config, "w") as fh:
            jsonlib.dump(raw, fh)
        from facet_tpu.api import create_app
        from facet_tpu.web import TestClient

        client = TestClient(create_app(db_path=seeded_db,
                                       config_path=tmp_config))
        tok = client.post("/api/auth/login", json={
            "username": "eve", "password": "pw"}).json()["token"]
        res = client.get("/api/scan/status",
                         headers={"Authorization": f"Bearer {tok}"})
        assert res.status_code == 403   # log leaks paths; superadmin only


class TestComparisonRevote:
    def test_revote_replaces_category_and_timestamp(self, seeded_db):
        from facet_tpu.comparison.manager import ComparisonManager
        from facet_tpu.db.connection import get_connection

        with get_connection(seeded_db) as conn:
            a, b = [r[0] for r in conn.execute(
                "SELECT path FROM photos LIMIT 2")]
        mgr = ComparisonManager(seeded_db)
        cid = mgr.submit(a, b, "a", category="portrait")
        with get_connection(seeded_db) as conn:
            conn.execute("UPDATE comparisons SET timestamp ="
                         " '2020-01-01 00:00:00' WHERE id = ?", (cid,))
        cid2 = mgr.submit(a, b, "b", category="landscape")
        assert cid2 == cid
        with get_connection(seeded_db) as conn:
            row = dict(conn.execute(
                "SELECT winner, category, timestamp FROM comparisons"
                " WHERE id = ?", (cid,)).fetchone())
        assert row["winner"] == "b"
        assert row["category"] == "landscape"      # re-vote wins
        assert row["timestamp"] != "2020-01-01 00:00:00"

    def test_unknown_photo_is_client_error(self, client, seeded_db):
        from facet_tpu.db.connection import get_connection

        with get_connection(seeded_db) as conn:
            a = conn.execute("SELECT path FROM photos LIMIT 1").fetchone()[0]
        res = client.post("/api/comparison/submit", json={
            "photo_a": a, "photo_b": "/gone/deleted.jpg", "winner": "a"})
        assert res.status_code == 400
