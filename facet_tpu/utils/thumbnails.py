"""Thumbnail generation (640px q80 JPEG by default; reference scorer.py:1611)."""

import io

from PIL import Image


def make_thumbnail(pil_img, size=640, quality=80):
    """PIL image -> JPEG bytes with the long edge capped at `size`."""
    img = pil_img.copy()
    img.thumbnail((size, size))
    buf = io.BytesIO()
    img.convert("RGB").save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def thumbnail_from_array(rgb_array, size=640, quality=80):
    return make_thumbnail(Image.fromarray(rgb_array), size, quality)


def decode_thumbnail(blob):
    """Stored JPEG blob -> RGB numpy array, or None."""
    if not blob:
        return None
    import numpy as np

    try:
        return np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"), dtype=np.uint8)
    except Exception:
        return None
