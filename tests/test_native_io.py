"""Native JPEG decoder tests (skipped when native/libfacet_io.so isn't built)."""

import numpy as np
import pytest
from PIL import Image

from facet_tpu.utils import native_decode

pytestmark = pytest.mark.skipif(not native_decode.available(),
                                reason="native library not built")


@pytest.fixture
def jpegs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(120, 160), (64, 48), (200, 200)]):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append((p, arr))
    return paths


def test_batch_decode_matches_pil(jpegs):
    paths = [p for p, _ in jpegs]
    decoded = native_decode.decode_jpeg_batch(paths, n_threads=2)
    assert decoded is not None and len(decoded) == 3
    for (path, _), arr in zip(jpegs, decoded):
        pil = np.asarray(Image.open(path).convert("RGB"))
        assert arr.shape == pil.shape
        # both decode the same JPEG; IDCT rounding may differ by ±1
        assert np.abs(arr.astype(int) - pil.astype(int)).max() <= 1


def test_failure_slots_are_none(jpegs, tmp_path):
    bad = str(tmp_path / "broken.jpg")
    with open(bad, "wb") as fh:
        fh.write(b"not a jpeg")
    missing = str(tmp_path / "missing.jpg")
    decoded = native_decode.decode_jpeg_batch([jpegs[0][0], bad, missing])
    assert decoded[0] is not None
    assert decoded[1] is None
    assert decoded[2] is None


def test_exif_orientation_applied(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (40, 80, 3), dtype=np.uint8)
    path = str(tmp_path / "rot.jpg")
    img = Image.fromarray(arr)
    exif = img.getexif()
    exif[274] = 6  # rotate 90 CW
    img.save(path, quality=95, exif=exif)

    decoded = native_decode.decode_jpeg_batch([path])[0]
    from PIL import ImageOps

    want = np.asarray(ImageOps.exif_transpose(Image.open(path)).convert("RGB"))
    assert decoded.shape == want.shape == (80, 40, 3)
    assert np.abs(decoded.astype(int) - want.astype(int)).max() <= 1


def test_decode_time_downscale(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (1600, 2400, 3), dtype=np.uint8)
    path = str(tmp_path / "big.jpg")
    Image.fromarray(arr).save(path, quality=85)
    decoded = native_decode.decode_jpeg_batch([path], max_long_edge=1200)[0]
    # 2400 long edge with 1/2 DCT scaling -> 1200
    assert decoded.shape == (800, 1200, 3)
