"""Unit tests for the remaining util components: export, maintenance,
incremental bursts, silhouette util, EXIF fallback, pair selector,
comparison manager."""

import numpy as np
import pytest
from PIL import Image

from facet_tpu.db.connection import get_connection


class TestExport:
    def test_csv_and_json(self, tmp_db, tmp_path):
        from facet_tpu.utils.export import export_photos

        with get_connection(tmp_db) as conn:
            conn.execute("INSERT INTO photos (path, filename, aggregate, tags)"
                         " VALUES ('/a.jpg', 'a.jpg', 7.5, 'sunset')")
        csv_path = export_photos(tmp_db, "csv", str(tmp_path / "out.csv"))
        text = open(csv_path).read()
        assert "aggregate" in text and "/a.jpg" in text
        json_path = export_photos(tmp_db, "json", str(tmp_path / "out.json"))
        import json

        rows = json.load(open(json_path))
        assert rows[0]["aggregate"] == 7.5
        with pytest.raises(ValueError):
            export_photos(tmp_db, "xml")


class TestMaintenance:
    def test_orphan_cleanup_and_vacuum(self, tmp_db):
        from facet_tpu.db.maintenance import cleanup_orphaned_persons, vacuum_database

        with get_connection(tmp_db) as conn:
            conn.execute("INSERT INTO persons (name) VALUES ('ghost')")
            conn.execute("INSERT INTO photos (path) VALUES ('/p.jpg')")
            conn.execute("INSERT INTO faces (photo_path, face_index, embedding,"
                         " person_id) VALUES ('/p.jpg', 0, x'00', 2)")
            conn.execute("INSERT INTO persons (name) VALUES ('real')")
        removed = cleanup_orphaned_persons(tmp_db, verbose=False)
        assert removed == 1
        vacuum_database(tmp_db, verbose=False)

    def test_viewer_export(self, tmp_db, tmp_path):
        import io

        from facet_tpu.db.maintenance import export_viewer_db

        buf = io.BytesIO()
        Image.new("RGB", (640, 480), (10, 20, 30)).save(buf, "JPEG")
        with get_connection(tmp_db) as conn:
            conn.execute(
                "INSERT INTO photos (path, thumbnail, clip_embedding)"
                " VALUES ('/a.jpg', ?, x'00')", (buf.getvalue(),))
        out = export_viewer_db(tmp_db, str(tmp_path / "viewer.db"),
                               thumb_size=100, verbose=False)
        with get_connection(out) as conn:
            row = conn.execute("SELECT thumbnail, clip_embedding FROM photos"
                               ).fetchone()
        assert row[1] is None  # raw blobs dropped
        small = Image.open(io.BytesIO(row[0]))
        assert max(small.size) <= 100


class TestIncrementalBurst:
    def test_grouping(self, scoring_config):
        from facet_tpu.utils.burst import IncrementalBurstProcessor

        proc = IncrementalBurstProcessor(scoring_config)
        assert proc.add("/a.jpg", "2026:01:01 12:00:00", "0" * 16, 5.0) is None
        assert proc.add("/b.jpg", "2026:01:01 12:00:01", "0" * 16, 7.0) is None
        # a visually different photo hours later closes the burst
        done = proc.add("/c.jpg", "2026:01:01 18:00:00", "f" * 16, 6.0)
        assert done["members"] == ["/a.jpg", "/b.jpg"]
        assert done["lead"] == "/b.jpg"
        tail = proc.flush()
        assert tail["members"] == ["/c.jpg"]
        assert proc.flush() is None


class TestSilhouetteUtil:
    def test_from_histogram(self):
        from facet_tpu.utils.detection import detect_silhouette

        dark_bright = np.zeros(256, np.int64)
        dark_bright[5] = 500    # heavy shadows
        dark_bright[250] = 400  # strong highlights
        dark_bright[128] = 100
        assert detect_silhouette(dark_bright) == 1
        flat = np.full(256, 10, np.int64)
        assert detect_silhouette(flat) == 0
        assert detect_silhouette(np.zeros(256)) == 0


class TestExifFallback:
    def test_pil_exif_roundtrip(self, tmp_path):
        from facet_tpu.utils.exif import get_exif_batch

        path = str(tmp_path / "x.jpg")
        img = Image.new("RGB", (320, 240), (1, 2, 3))
        exif = img.getexif()
        exif[272] = "TestCam"       # Model
        exif[306] = "2026:05:01 10:00:00"
        img.save(path, exif=exif)
        out = get_exif_batch([path])[path]
        assert out["camera_model"] == "TestCam"
        assert out["image_width"] == 320
        assert out["date_taken"].startswith("2026:05:01")

    def test_pil_rational_tags(self, tmp_path):
        """PIL hands EXIF rationals through as (num, den) tuples in some
        versions — exposure/aperture/focal must still parse, and the
        shutter stores the reference's numeric-seconds string."""
        from facet_tpu.utils.exif import get_exif_batch

        path = str(tmp_path / "rational.jpg")
        img = Image.new("RGB", (320, 240), (9, 9, 9))
        exif = img.getexif()
        exif[0x0110] = "CamR"
        exif[0x8827] = 640                # ISO
        exif[0x829A] = (1, 250)           # ExposureTime
        exif[0x829D] = (28, 10)           # FNumber
        exif[0x920A] = (85, 1)            # FocalLength
        img.save(path, exif=exif)
        out = get_exif_batch([path])[path]
        assert out["f_stop"] == 2.8
        assert out["shutter_speed"] == "0.004"
        assert out["focal_length"] == 85.0
        assert out["iso"] == 640


class TestPairSelector:
    @pytest.fixture
    def comparison_db(self, tmp_db):
        with get_connection(tmp_db) as conn:
            for i in range(20):
                conn.execute(
                    "INSERT INTO photos (path, aggregate, thumbnail)"
                    " VALUES (?, ?, x'FFD8')", (f"/c/{i}.jpg", 4.0 + i * 0.25))
        return tmp_db

    def test_strategies_produce_new_pairs(self, comparison_db):
        from facet_tpu.comparison.manager import ComparisonManager
        from facet_tpu.comparison.pair_selector import PairSelector

        manager = ComparisonManager(comparison_db)
        seen = set()
        for strategy in ("uncertainty", "boundary", "active", "random"):
            pair = PairSelector(comparison_db, strategy, seed=1).next_pair()
            assert pair is not None and pair[0] != pair[1]
            manager.submit(pair[0], pair[1], "a")
            key = tuple(sorted(pair))
            assert key not in seen  # dedup against already-compared pairs
            seen.add(key)

    def test_manager_stats(self, comparison_db):
        from facet_tpu.comparison.manager import ComparisonManager

        manager = ComparisonManager(comparison_db)
        manager.submit("/c/0.jpg", "/c/19.jpg", "b")
        manager.submit("/c/1.jpg", "/c/2.jpg", "tie")
        assert manager.count() == 2
        stats = manager.statistics()
        assert stats["by_winner"] == {"b": 1, "tie": 1}
        # the aggregate ordering agrees with the 'b' vote (19 > 0)
        assert manager.agreement_accuracy() == 1.0
        cid = manager.history(limit=1)[0]["id"]
        assert manager.edit(cid, "a")
        assert manager.delete(cid)
        assert not manager.delete(99999)


class TestPersistentExifTool:
    @staticmethod
    def _fake_exiftool(tmp_path):
        """A script speaking the -stay_open protocol: JSON + {readyN}."""
        script = tmp_path / "fake_exiftool"
        script.write_text(
            "#!/bin/bash\n"
            "f=''\n"
            "while read -r line; do\n"
            "  case \"$line\" in\n"
            "    -execute*) n=\"${line#-execute}\";\n"
            "      echo \"[{\\\"SourceFile\\\":\\\"$f\\\",\\\"ISO\\\":200,\\\"FNumber\\\":2.8}]\";\n"
            "      echo \"{ready$n}\";;\n"
            "    -stay_open) read -r v; [ \"$v\" = \"False\" ] && exit 0;;\n"
            "    -*) :;;\n"
            "    *) f=\"$line\";;\n"
            "  esac\n"
            "done\n")
        script.chmod(0o755)
        return str(script)

    def test_stay_open_roundtrip(self, tmp_path):
        import json

        from facet_tpu.utils.exif import _EXIFTOOL_ARGS, PersistentExifTool

        tool = PersistentExifTool(binary=self._fake_exiftool(tmp_path))
        try:
            out = tool.execute(_EXIFTOOL_ARGS + ["/x/a.jpg"], timeout=5)
            records = json.loads(out)
            assert records[0]["SourceFile"] == "/x/a.jpg"
            assert records[0]["ISO"] == 200
            # second command reuses the SAME process (sequence increments)
            pid = tool._proc.pid
            out2 = tool.execute(_EXIFTOOL_ARGS + ["/x/b.jpg"], timeout=5)
            assert json.loads(out2)[0]["SourceFile"] == "/x/b.jpg"
            assert tool._proc.pid == pid
        finally:
            tool.close()
        assert tool._proc is None

    def test_timeout_restarts_process(self, tmp_path):
        from facet_tpu.utils.exif import PersistentExifTool

        hang = tmp_path / "hang_exiftool"
        hang.write_text("#!/bin/bash\nwhile read -r line; do :; done\n")
        hang.chmod(0o755)
        tool = PersistentExifTool(binary=str(hang))
        try:
            assert tool.execute(["-json", "/x/a.jpg"], timeout=0.3) is None
            assert tool._proc is None  # hung process was torn down
        finally:
            tool.close()


class TestBurstReviewFixes:
    def test_phashless_seed_does_not_crash_stream(self, scoring_config):
        """A phash-less photo seeding the open burst must not TypeError
        the next hashed photo (round-4 review finding)."""
        from facet_tpu.utils.burst import IncrementalBurstProcessor

        proc = IncrementalBurstProcessor(scoring_config)
        assert proc.add("/b/a.jpg", "2024:06:01 12:00:00", None, 5.0) is None
        out = proc.add("/b/b.jpg", "2024:06:01 12:00:03",
                       "a1b2c3d4e5f60718", 6.0)
        # the hashed photo cannot join a phash-less member: previous burst
        # closes with the seed alone
        assert out is not None and out["members"] == ["/b/a.jpg"]

    def test_mixed_date_formats_group_chronologically(self, tmp_db,
                                                      scoring_config):
        """EXIF ':' and ISO '-' dates of one burst must sort adjacent —
        lexicographic ORDER BY splits them ('-' < ':')."""
        from facet_tpu.db.connection import get_connection
        from facet_tpu.utils.burst import process_bursts

        with get_connection(tmp_db) as conn:
            for path, date in (
                    ("/m/x1.jpg", "2024:06:01 12:00:01"),
                    ("/m/x2.jpg", "2024-06-01T12:00:02"),
                    ("/m/x3.jpg", "2024:06:01 12:00:03"),
                    ("/m/far.jpg", "2024:06-01 18:00:00".replace("-", ":"))):
                conn.execute(
                    "INSERT INTO photos (path, date_taken, aggregate,"
                    " phash) VALUES (?, ?, 5.0, ?)",
                    (path, date, "a1b2c3d4e5f60718"))
        process_bursts(tmp_db, scoring_config)
        with get_connection(tmp_db) as conn:
            leads = {r[0]: r[1] for r in conn.execute(
                "SELECT path, is_burst_lead FROM photos")}
        # the three same-second-window frames form ONE burst (one lead);
        # the far photo is its own burst
        assert sum(leads[p] for p in
                   ("/m/x1.jpg", "/m/x2.jpg", "/m/x3.jpg")) == 1
        assert leads["/m/far.jpg"] == 1
