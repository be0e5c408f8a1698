"""Live subprocess tests for the exiftool legs of utils/exif.py.

The real exiftool binary is absent on this host, so these tests drive
PersistentExifTool and the chunked-subprocess path against
tests/fixtures/fake_exiftool.py — a stub speaking the genuine
`-stay_open True -@ -` / `{ready<N>}` protocol (reference:
exiftool/exiftool_batch.py:16-163) with fault injection for
hang/timeout/restart scenarios.
"""

import json
import os
import sys

import pytest

from facet_tpu.utils import exif

STUB = os.path.join(os.path.dirname(__file__), "fixtures", "fake_exiftool.py")


@pytest.fixture
def stub_exiftool(monkeypatch, tmp_path):
    """Point the whole module at the stub binary, with a fresh singleton
    and a fresh fault-injection counter."""
    monkeypatch.setattr(exif, "EXIFTOOL_BIN", STUB)
    state = str(tmp_path / "counter")
    monkeypatch.setenv("FAKE_EXIFTOOL_STATE", state)
    monkeypatch.delenv("FAKE_EXIFTOOL_HANG_UNTIL", raising=False)
    exif._persistent = None
    yield state
    if exif._persistent is not None:
        exif._persistent.close()
        exif._persistent = None


def _touch(tmp_path, name="a.jpg", meta=None):
    path = str(tmp_path / name)
    open(path, "wb").close()
    if meta is not None:
        with open(path + ".meta.json", "w") as fh:
            json.dump(meta, fh)
    return path


class TestPersistentExifTool:
    def test_happy_path_roundtrip(self, stub_exiftool, tmp_path):
        path = _touch(tmp_path, meta={"ISO": 1600, "Model": "StubCam"})
        tool = exif.PersistentExifTool(binary=STUB)
        try:
            raw = tool.execute(exif._EXIFTOOL_ARGS + [path], timeout=10)
            assert raw is not None
            rec = json.loads(raw)[0]
            assert rec["SourceFile"] == path
            assert rec["ISO"] == 1600
            assert rec["Model"] == "StubCam"
        finally:
            tool.close()

    def test_process_reused_across_calls(self, stub_exiftool, tmp_path):
        path = _touch(tmp_path)
        tool = exif.PersistentExifTool(binary=STUB)
        try:
            assert tool.execute([path], timeout=10) is not None
            pid = tool._proc.pid
            assert tool.execute([path], timeout=10) is not None
            assert tool._proc.pid == pid
        finally:
            tool.close()

    def test_timeout_then_restart(self, stub_exiftool, tmp_path, monkeypatch):
        path = _touch(tmp_path)
        # the first stay-open REQUEST hangs; the replacement process's
        # first request (counter 1) answers
        monkeypatch.setenv("FAKE_EXIFTOOL_HANG_UNTIL", "1")
        tool = exif.PersistentExifTool(binary=STUB)
        try:
            assert tool.execute([path], timeout=1.5) is None
            assert tool._proc is None  # hung process was torn down
            raw = tool.execute([path], timeout=10)
            assert raw is not None and json.loads(raw)[0]["SourceFile"] == path
        finally:
            tool.close()

    def test_dead_process_restarted(self, stub_exiftool, tmp_path):
        path = _touch(tmp_path)
        tool = exif.PersistentExifTool(binary=STUB)
        try:
            assert tool.execute([path], timeout=10) is not None
            old = tool._proc
            old.kill()
            old.wait(timeout=5)
            raw = tool.execute([path], timeout=10)
            assert raw is not None
            assert tool._proc.pid != old.pid
        finally:
            tool.close()

    def test_close_terminates_cleanly(self, stub_exiftool, tmp_path):
        path = _touch(tmp_path)
        tool = exif.PersistentExifTool(binary=STUB)
        assert tool.execute([path], timeout=10) is not None
        proc = tool._proc
        tool.close()
        assert proc.wait(timeout=5) is not None
        assert tool._proc is None

    def test_get_exif_single_through_stay_open(self, stub_exiftool, tmp_path):
        path = _touch(tmp_path, meta={
            "DateTimeOriginal": "2023:01:02 03:04:05",
            "Aperture": 1.8, "ExposureTime": 0.008,
            "FocalLengthIn35mmFormat": 85,
        })
        out = exif.get_exif_single(path)
        assert out["date_taken"] == "2023:01:02 03:04:05"
        assert out["f_stop"] == 1.8
        assert out["shutter_speed"] == "0.008"
        assert out["focal_length_35mm"] == 85.0
        assert out["camera_model"] == "FakeCam X1"


class TestChunkedSubprocess:
    def test_batch_roundtrip(self, stub_exiftool, tmp_path):
        paths = [
            _touch(tmp_path, f"img{i}.jpg", meta={"ISO": 100 * (i + 1)})
            for i in range(3)
        ]
        out = exif.get_exif_batch(paths, timeout=10)
        assert set(out) == set(paths)
        assert [out[p]["iso"] for p in paths] == [100, 200, 300]

    def test_first_invocation_timeout_retries_doubled(
            self, stub_exiftool, tmp_path, monkeypatch):
        path = _touch(tmp_path, meta={"ISO": 640})
        # first SUBPROCESS invocation hangs; the doubled-timeout retry
        # (a fresh invocation, counter 1) answers
        monkeypatch.setenv("FAKE_EXIFTOOL_HANG_UNTIL", "1")
        out = exif._exiftool_chunk([path], timeout=1.5)
        assert out[path]["iso"] == 640

    def test_both_timeouts_fall_back_to_pil(
            self, stub_exiftool, tmp_path, monkeypatch):
        from PIL import Image

        path = str(tmp_path / "real.jpg")
        Image.new("RGB", (32, 24)).save(path)
        monkeypatch.setenv("FAKE_EXIFTOOL_HANG_UNTIL", "99")
        out = exif._exiftool_chunk([path], timeout=1.0)
        # PIL fallback: dimensions come from the actual file
        assert out[path]["image_width"] == 32
        assert out[path]["image_height"] == 24
        assert out[path]["camera_model"] is None

    def test_missing_record_yields_empty(self, stub_exiftool, tmp_path):
        present = _touch(tmp_path, "here.jpg")
        # the stub answers for every path given; simulate a dropped record
        # by asking the module for a path the stub never saw
        out = exif._exiftool_chunk([present], timeout=10)
        assert out[present]["camera_model"] == "FakeCam X1"
        assert set(out[present]) == set(exif.FIELDS)
