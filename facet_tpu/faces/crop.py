"""Shared face-crop geometry: bbox scale + padding + clamp + JPEG encode.

Used by the offline thumbnail refill (faces/processor.py, sized by the
face_processing config block) and the API's on-the-fly face thumbnails
(api/routers/thumbnails.py, sized by viewer.face_thumbnails) — one
implementation so the two paths cannot drift.
"""

import io


def crop_face_jpeg(pil_image, bbox, scale=1.0, pad=0.2, out_px=64,
                   quality=80, min_px=0):
    """-> JPEG bytes of the padded face crop, or None when the bbox is
    unusable or the crop comes out smaller than min_px on either side.

    pil_image: PIL RGB image; bbox: (x1, y1, x2, y2) in ORIGINAL image
    coordinates; scale: pil_image.width / original_width.
    """
    x1, y1, x2, y2 = bbox
    if None in bbox:
        return None
    bx1, by1, bx2, by2 = (v * scale for v in bbox)
    pw, ph = (bx2 - bx1) * pad, (by2 - by1) * pad
    box = (int(max(0, bx1 - pw)), int(max(0, by1 - ph)),
           int(min(pil_image.width, bx2 + pw)),
           int(min(pil_image.height, by2 + ph)))
    if box[2] - box[0] <= 0 or box[3] - box[1] <= 0:
        return None
    if box[2] - box[0] < min_px or box[3] - box[1] < min_px:
        return None
    crop = pil_image.crop(box)
    crop.thumbnail((out_px, out_px))
    buf = io.BytesIO()
    crop.save(buf, "JPEG", quality=quality)
    return buf.getvalue()
