"""End-to-end engine tests: scan -> DB rows -> recompute -> bursts -> dupes.

Uses a tiny CLIP architecture override so the full pipeline runs in seconds
on the CPU test platform.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

TINY_ARCH = {"image_size": 28, "patch_size": 14, "width": 32, "layers": 1,
             "heads": 2, "projection_dim": 768}


@pytest.fixture
def tiny_config(tmp_path):
    from facet_tpu.config.default_config import build_default_config
    from facet_tpu.config.scoring_config import ScoringConfig

    cfg = build_default_config()
    cfg["models"]["clip"]["architecture"] = TINY_ARCH
    cfg["models"]["vram_profile"] = "legacy"
    path = str(tmp_path / "scoring_config.json")
    with open(path, "w") as fh:
        json.dump(cfg, fh)
    return ScoringConfig(path)


@pytest.fixture
def photo_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "photos"
    d.mkdir()
    for i in range(6):
        arr = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"img{i}.jpg", quality=90)
    # a duplicate pair: same image saved twice
    arr = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    Image.fromarray(arr).save(d / "dup_a.jpg", quality=95)
    Image.fromarray(arr).save(d / "dup_b.jpg", quality=93)
    # an unreadable file with an image extension
    (d / "broken.jpg").write_bytes(b"not an image")
    return str(d)


@pytest.fixture
def engine(tmp_path, tiny_config):
    from facet_tpu.processing.scorer import Facet

    return Facet(str(tmp_path / "test.db"), tiny_config)


class TestScorePaths:
    def test_full_scan_writes_complete_rows(self, engine, photo_dir):
        from facet_tpu.db.connection import get_connection
        from facet_tpu.utils.image_loading import gather_image_files

        files = gather_image_files(photo_dir)
        assert len(files) == 9  # broken.jpg included until load fails
        rows, errors = engine.score_paths(files)
        assert len(rows) == 8
        assert len(errors) == 1
        engine.save_photos_batch(rows)

        with get_connection(engine.db_path) as conn:
            db_rows = [dict(r) for r in conn.execute("SELECT * FROM photos")]
        assert len(db_rows) == 8
        for r in db_rows:
            assert r["aggregate"] is not None and 0 <= r["aggregate"] <= 10
            assert r["aesthetic"] is not None
            assert r["tech_sharpness"] is not None
            assert r["exposure_score"] is not None
            assert r["comp_score"] is not None
            assert len(r["clip_embedding"]) == 768 * 4
            assert len(r["histogram_data"]) == 256 * 4
            assert r["phash"] and len(r["phash"]) == 16
            assert r["thumbnail"][:2] == b"\xff\xd8"  # JPEG magic
            assert r["category"] in engine.config.get_all_category_names()
            assert r["config_version"] == engine.config.version_hash
            assert r["image_width"] == 128 and r["image_height"] == 96

    def test_already_scanned_set(self, engine, photo_dir):
        from facet_tpu.utils.image_loading import gather_image_files

        files = [f for f in gather_image_files(photo_dir)
                 if "broken" not in f][:3]
        rows, _ = engine.score_paths(files)
        engine.save_photos_batch(rows)
        done = engine.get_already_scanned_set()
        assert set(files) <= done


class TestRecompute:
    def test_update_all_aggregates_idempotent(self, engine, photo_dir):
        from facet_tpu.db.connection import get_connection
        from facet_tpu.utils.image_loading import gather_image_files

        files = [f for f in gather_image_files(photo_dir)
                 if "broken" not in f][:4]
        rows, _ = engine.score_paths(files)
        engine.save_photos_batch(rows)
        before = {r["path"]: r["aggregate"] for r in rows}

        # without aesthetic rescoring (and with percentile normalization off)
        # the aggregate must reproduce exactly: same stored inputs, same math
        engine.config.config["normalization"]["method"] = "none"
        n = engine.update_all_aggregates(rescore_embeddings=False)
        assert n == 4
        with get_connection(engine.db_path) as conn:
            after = dict(conn.execute("SELECT path, aggregate FROM photos"))
        for path, score in after.items():
            assert score == pytest.approx(before[path], abs=0.02), path

        # with aesthetic rescoring (normalized-embedding contract, reference
        # quirk) the FIRST recompute may shift; the second must be stable
        engine.update_all_aggregates(rescore_embeddings=True)
        with get_connection(engine.db_path) as conn:
            first = dict(conn.execute("SELECT path, aggregate FROM photos"))
        engine.update_all_aggregates(rescore_embeddings=True)
        with get_connection(engine.db_path) as conn:
            second = dict(conn.execute("SELECT path, aggregate FROM photos"))
        assert first == second


class TestBurstsAndDuplicates:
    def test_duplicates_grouped(self, engine, photo_dir):
        from facet_tpu.db.connection import get_connection
        from facet_tpu.utils.duplicate import detect_duplicates
        from facet_tpu.utils.image_loading import gather_image_files

        files = gather_image_files(photo_dir)
        rows, _ = engine.score_paths(files)
        engine.save_photos_batch(rows)
        groups = detect_duplicates(engine.db_path, engine.config, verbose=False)
        assert groups >= 1
        with get_connection(engine.db_path) as conn:
            dup_rows = conn.execute(
                "SELECT path, is_duplicate_lead FROM photos"
                " WHERE duplicate_group_id IS NOT NULL").fetchall()
        paths = {os.path.basename(r[0]) for r in dup_rows}
        assert {"dup_a.jpg", "dup_b.jpg"} <= paths
        assert sum(r[1] for r in dup_rows) >= 1  # exactly one lead per group

    def test_bursts_flag_leads(self, engine, photo_dir):
        from facet_tpu.db.connection import get_connection
        from facet_tpu.utils.burst import process_bursts
        from facet_tpu.utils.image_loading import gather_image_files

        files = gather_image_files(photo_dir)
        rows, _ = engine.score_paths(files)
        # give the duplicate pair burst-adjacent timestamps
        for row in rows:
            base = os.path.basename(row["path"])
            if base == "dup_a.jpg":
                row["date_taken"] = "2026:01:01 12:00:00"
            elif base == "dup_b.jpg":
                row["date_taken"] = "2026:01:01 12:00:02"
            else:
                row["date_taken"] = f"2026:03:0{(hash(base) % 9) + 1} 10:00:00"
        engine.save_photos_batch(rows)
        process_bursts(engine.db_path, engine.config)
        with get_connection(engine.db_path) as conn:
            flags = dict(conn.execute("SELECT path, is_burst_lead FROM photos"))
        dup_flags = {os.path.basename(p): v for p, v in flags.items()
                     if "dup_" in p}
        # the near-identical rapid pair collapses to one lead
        assert sorted(dup_flags.values()) == [0, 1]


class TestMultiPass:
    def test_chunked_processing(self, engine, photo_dir):
        from facet_tpu.db.connection import get_connection
        from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor
        from facet_tpu.utils.image_loading import gather_image_files

        proc = ChunkedMultiPassProcessor(engine)
        proc.chunk_size = 3
        proc.monitor.chunk_size = 3
        files = gather_image_files(photo_dir)
        n = proc.process_directory(files, verbose=False)
        assert n == 8
        with get_connection(engine.db_path) as conn:
            count = conn.execute(
                "SELECT COUNT(*) FROM photos WHERE aggregate IS NOT NULL").fetchone()[0]
        assert count == 8

    def test_single_pass_mode(self, engine, photo_dir):
        from facet_tpu.processing.batch_processor import BatchProcessor
        from facet_tpu.utils.image_loading import gather_image_files

        proc = BatchProcessor(engine, batch_size=4, num_workers=2)
        files = gather_image_files(photo_dir)
        n = proc.process_stream(files, save_interval=5, verbose=False)
        assert n == 8

    def test_pass_planning(self, engine):
        from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor

        proc = ChunkedMultiPassProcessor(engine)
        passes = proc.detect_and_configure(verbose=False)
        assert passes  # at least one pass with at least clip
        assert any("clip" in group for group in passes)

    def test_clip_group_runs_at_its_bin_packed_position(self, engine,
                                                        photo_dir):
        """The fused CLIP program (and a co-resident insightface) must run
        INSIDE their bin-packed pass group, not as a chunk-level prepass:
        running them before group 0 co-residents them with group 0's
        models, which the first-fit-decreasing HBM budget never allowed
        for (sixth-review-pass finding)."""
        from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor
        from facet_tpu.utils.image_loading import gather_image_files, load_image

        proc = ChunkedMultiPassProcessor(engine)
        proc.detect_and_configure(verbose=False)
        # simulate a plan where a big model owns group 0 (e.g. a 7B VLM on
        # a 16 GB chip) and clip+insightface share group 1
        proc.passes = [["vlm_tagger"], ["clip", "insightface"]]

        events = []
        orig_run = proc._run_pass_group
        orig_fused = proc._run_fused_clip_pass

        def run_spy(group, state):
            events.append(("group", tuple(group)))
            return orig_run(group, state)

        def fused_spy(group, state):
            events.append(("fused", tuple(group)))
            return orig_fused(group, state)

        proc._run_pass_group = run_spy
        proc._run_fused_clip_pass = fused_spy
        files = [p for p in gather_image_files(photo_dir)
                 if "img" in p][:2]
        images = [np.asarray(load_image(p), dtype=np.uint8) for p in files]
        pils = [Image.fromarray(a) for a in images]
        n = proc._process_loaded_chunk(files, images, pils,
                                       {p: {} for p in files})
        assert n == 2
        fused_at = events.index(("fused", ("clip", "insightface")))
        group0_at = events.index(("group", ("vlm_tagger",)))
        assert group0_at < fused_at, events


class _FakeQuality:
    """Stand-in NR-IQA scorer returning a constant score."""

    def __init__(self, value):
        self.value = value

    def score_batch(self, images):
        return [self.value] * len(images)


class TestQualityWiring:
    """The quality model's score must DRIVE the aggregate, not ride along
    cosmetically (reference: scorer.py:1755-1765 update_quality_scores)."""

    def _scan(self, engine, files, quality_value):
        from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor

        engine.models.loaded.pop("topiq", None)
        engine.models.register(
            "topiq", lambda config, cached: _FakeQuality(quality_value))
        proc = ChunkedMultiPassProcessor(engine)
        proc.selected_models = ["clip", "topiq"]
        proc.passes = engine.models.group_passes(proc.selected_models)
        proc.process_directory(files, verbose=False)

    def test_quality_score_drives_aggregate(self, engine, photo_dir):
        from facet_tpu.db.connection import get_connection
        from facet_tpu.utils.image_loading import gather_image_files

        files = [f for f in gather_image_files(photo_dir)
                 if "broken" not in f][:3]

        self._scan(engine, files, 9.0)
        with get_connection(engine.db_path) as conn:
            high = {r[0]: r[1:] for r in conn.execute(
                "SELECT path, aggregate, aesthetic, topiq_score,"
                " quality_score, scoring_model FROM photos")}
        for agg, aes, topiq, quality, model in high.values():
            assert topiq == 9.0 and quality == 9.0
            assert aes == 9.0  # quality replaces the CLIP aesthetic
            assert model == "topiq"

        self._scan(engine, files, 1.0)
        with get_connection(engine.db_path) as conn:
            low = dict(conn.execute("SELECT path, aggregate FROM photos"))
        for path, agg in low.items():
            assert agg < high[path][0]  # aggregate follows the quality score

    def test_recompute_preserves_quality_aesthetic(self, engine, photo_dir):
        from facet_tpu.db.connection import get_connection
        from facet_tpu.utils.image_loading import gather_image_files

        files = [f for f in gather_image_files(photo_dir)
                 if "broken" not in f][:2]
        self._scan(engine, files, 8.5)
        engine.config.config["normalization"]["method"] = "none"
        engine.update_all_aggregates(rescore_embeddings=True)
        with get_connection(engine.db_path) as conn:
            rows = conn.execute(
                "SELECT aesthetic, scoring_model FROM photos").fetchall()
        for aes, model in rows:
            assert model == "topiq"
            assert aes == 8.5  # not clobbered by the CLIP-embedding rescore

    def test_musiq_profile_end_to_end(self, tmp_path, tiny_config, photo_dir):
        from facet_tpu.db.connection import get_connection
        from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor
        from facet_tpu.processing.scorer import Facet
        from facet_tpu.utils.image_loading import gather_image_files

        profiles = tiny_config.config["models"]["profiles"]
        profiles["16gb"]["aesthetic_model"] = "musiq"
        profiles["16gb"]["composition_model"] = "rule-based"
        tiny_config.config["models"]["vram_profile"] = "16gb"
        engine = Facet(str(tmp_path / "musiq.db"), tiny_config)
        proc = ChunkedMultiPassProcessor(engine)
        proc.detect_and_configure(verbose=False)
        assert "musiq" in proc.selected_models
        files = [f for f in gather_image_files(photo_dir)
                 if "broken" not in f][:2]
        n = proc.process_directory(files, verbose=False)
        assert n == 2
        with get_connection(engine.db_path) as conn:
            rows = conn.execute(
                "SELECT aggregate, quality_score, scoring_model FROM photos").fetchall()
        for agg, quality, model in rows:
            assert model == "musiq"
            assert quality is not None and 0 <= quality <= 10
            assert agg is not None

    def test_list_models_includes_all_iqa(self):
        from facet_tpu.models.model_manager import ModelManager

        names = {row[0] for row in ModelManager.list_available_models()}
        assert {"topiq", "hyperiqa", "dbcnn", "musiq", "clipiqa",
                "clip", "samp_net", "insightface"} <= names

    def test_quality_alias_selection(self, tiny_config):
        from facet_tpu.models.model_manager import ModelManager

        profiles = tiny_config.config["models"]["profiles"]
        profiles["16gb"]["aesthetic_model"] = "clipiqa+"
        tiny_config.config["models"]["vram_profile"] = "16gb"
        mm = ModelManager(tiny_config, hbm_gb=16.0)
        assert "clipiqa" in mm.select_models()


class TestModelManager:
    def test_bin_packing(self):
        from facet_tpu.models.model_manager import ModelManager

        mm = ModelManager(hbm_gb=16.0)
        passes = mm.group_passes(["clip", "samp_net", "insightface", "topiq"])
        assert len(passes) == 1  # all fit in 15 GB budget
        # single chip: the 18 GB VLM can't shard and forces its own pass
        from unittest import mock

        with mock.patch("jax.devices", return_value=[object()]):
            assert mm.requirements("vlm_tagger") == 18.0
            passes = mm.group_passes(["clip", "vlm_tagger", "topiq"],
                                     capacity_gb=19.0)
            assert len(passes) == 2
            for group in passes:
                assert sum(mm.requirements(m) for m in group) <= 19.0
        # 8 virtual devices (conftest): the decoder tensor-shards tp=2
        # (parallel/tp.py), the per-chip share drops to ~11 GB and the trio
        # packs into one pass
        assert 10.0 < mm.requirements("vlm_tagger") < 12.0
        passes = mm.group_passes(["clip", "vlm_tagger", "topiq"],
                                 capacity_gb=19.0)
        assert len(passes) == 1

    def test_host_ram_cache_roundtrip(self, tiny_config):
        from facet_tpu.models.model_manager import ModelManager

        mm = ModelManager(tiny_config, hbm_gb=0.0)
        model = mm.load_model("clip")
        ref_scores = model.score_from_embeddings_batch(np.eye(768, dtype=np.float32)[:2])
        mm.unload_model("clip")
        assert "clip" in mm.cache_stats()["cached_models"]
        model2 = mm.load_model("clip")
        again = model2.score_from_embeddings_batch(np.eye(768, dtype=np.float32)[:2])
        np.testing.assert_allclose(ref_scores, again, atol=1e-6)
        assert mm.cache_hits == 1


class TestDataPreservation:
    """Round-4 review fixes: rescans and single passes must not destroy
    user curation. The reference's INSERT OR REPLACE + foreign_keys=ON
    cascade-deletes a photo's faces (person assignments), comparison
    votes, and duplicate records on every --force rescan
    (processing/scorer.py:1621 + db/connection.py:47) — our save uses an
    UPSERT instead (deliberate divergence, docs/MIGRATION.md)."""

    def _paths(self, photo_dir, n=2):
        from facet_tpu.utils.image_loading import gather_image_files

        return sorted(os.path.abspath(p)
                      for p in gather_image_files(photo_dir)
                      if "broken" not in p)[:n]

    def test_force_rescan_preserves_linked_rows(self, engine, photo_dir):
        from facet_tpu.db.connection import get_connection

        files = self._paths(photo_dir)
        rows, errors = engine.score_paths(files)
        assert not errors
        engine.save_photos_batch(rows)
        a, b = rows[0]["path"], rows[1]["path"]
        with get_connection(engine.db_path) as conn:
            conn.execute(
                "INSERT INTO faces (photo_path, face_index, embedding,"
                " person_id) VALUES (?, 99, ?, 7)", (a, b"\x00" * 2048))
            conn.execute(
                "INSERT INTO comparisons (photo_a_path, photo_b_path,"
                " winner) VALUES (?, ?, 'a')", (a, b))

        rows2, _ = engine.score_paths(files)
        for r in rows2:
            r["_faces"] = []          # face model produced nothing this pass
        engine.save_photos_batch(rows2)

        with get_connection(engine.db_path) as conn:
            face = conn.execute(
                "SELECT person_id FROM faces WHERE photo_path = ?"
                " AND face_index = 99", (a,)).fetchone()
            assert face is not None and face[0] == 7
            assert conn.execute(
                "SELECT COUNT(*) FROM comparisons").fetchone()[0] == 1
            # and the photo row itself WAS overwritten (same semantics)
            agg = conn.execute("SELECT aggregate FROM photos WHERE path = ?",
                               (a,)).fetchone()[0]
            assert agg == pytest.approx(rows2[0]["aggregate"], abs=1e-6)

    def test_single_pass_preserves_other_pass_columns(self, engine,
                                                      photo_dir):
        from facet_tpu.db.connection import get_connection
        from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor

        files = self._paths(photo_dir, n=3)
        proc = ChunkedMultiPassProcessor(engine)
        proc.detect_and_configure(verbose=False)
        proc.process_directory(files, verbose=False)

        p0 = files[0]
        with get_connection(engine.db_path) as conn:
            conn.execute(
                "UPDATE photos SET quality_score = 8.5, topiq_score = 8.5,"
                " scoring_model = 'topiq', tags = 'sunset' WHERE path = ?",
                (p0,))

        proc2 = ChunkedMultiPassProcessor(engine)
        done = proc2.run_single_pass(files, "composition", verbose=False)
        assert done == len(files)

        with get_connection(engine.db_path) as conn:
            row = dict(conn.execute(
                "SELECT * FROM photos WHERE path = ?", (p0,)).fetchone())
        assert row["quality_score"] == 8.5        # other pass: preserved
        assert row["topiq_score"] == 8.5
        assert row["tags"] == "sunset"
        assert row["comp_score"] is not None      # this pass: recomputed
        assert row["aggregate"] is not None       # recomputed from merge
        assert row["config_version"] == engine.config.version_hash

    def test_zero_exposure_survives_recompute(self, engine, photo_dir):
        """exposure_score 0.0 is a legitimate worst-case value; the old
        `or 5.0` write-back silently bumped it (reference keeps 0.0)."""
        from facet_tpu.db.connection import get_connection

        files = self._paths(photo_dir, n=1)
        rows, _ = engine.score_paths(files)
        engine.save_photos_batch(rows)
        with get_connection(engine.db_path) as conn:
            conn.execute("UPDATE photos SET exposure_score = 0.0,"
                         " histogram_data = NULL")
        engine.update_all_aggregates(rescore_embeddings=False)
        with get_connection(engine.db_path) as conn:
            val = conn.execute(
                "SELECT exposure_score FROM photos").fetchone()[0]
        assert val == 0.0

    def test_unload_uses_actual_loaded_name(self, engine):
        """A fallback-loaded model must be unloaded under ITS name, and a
        failed chain must only be walked once per run."""
        from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor

        proc = ChunkedMultiPassProcessor(engine)
        calls = {"loaded": [], "unloaded": []}

        class StubMM:
            hbm_gb = 0.0

            def load_model(self, name):
                calls["loaded"].append(name)
                if name == "topiq":
                    raise RuntimeError("no checkpoint")
                return object()

            def unload_model(self, name):
                calls["unloaded"].append(name)

        proc.models = StubMM()
        name, model = proc._load_with_fallback("topiq")
        assert name == "clipiqa" and model is not None
        proc._unload_pass_group(["topiq"])
        assert calls["unloaded"] == ["clipiqa"]
        proc._load_with_fallback("topiq")
        assert calls["loaded"].count("topiq") == 1   # chain cached

    def test_load_chunk_records_decode_failures(self, engine, photo_dir):
        from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor

        proc = ChunkedMultiPassProcessor(engine)
        broken = os.path.join(photo_dir, "broken.jpg")
        ok, images, pils, exif = proc._load_chunk(
            self._paths(photo_dir, n=1) + [broken])
        assert len(ok) == 1
        assert broken in proc.load_errors
