"""Image crop/transform helpers (reference: utils/image_transforms.py)."""

import io

from PIL import Image


def crop_face_with_padding(image, bbox, padding_ratio=0.3):
    """Crop a face region with proportional padding, clamped to the frame.

    image: RGB uint8 array; bbox: [x1, y1, x2, y2]. Returns the crop array.
    """
    h, w = image.shape[:2]
    x1, y1, x2, y2 = bbox
    pad_x = (x2 - x1) * padding_ratio
    pad_y = (y2 - y1) * padding_ratio
    cx1 = int(max(0, x1 - pad_x))
    cy1 = int(max(0, y1 - pad_y))
    cx2 = int(min(w, x2 + pad_x))
    cy2 = int(min(h, y2 + pad_y))
    return image[cy1:cy2, cx1:cx2]


def crop_to_jpeg(image, bbox, padding_ratio=0.3, size=128, quality=85):
    """Face crop -> JPEG thumbnail bytes (or None for empty crops)."""
    crop = crop_face_with_padding(image, bbox, padding_ratio)
    if crop.size == 0:
        return None
    pil = Image.fromarray(crop)
    pil.thumbnail((size, size))
    buf = io.BytesIO()
    pil.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def scale_bbox(bbox, scale):
    """Scale a bbox between resolutions (RAW thumbnails vs full frames)."""
    return [int(round(v * scale)) for v in bbox]
