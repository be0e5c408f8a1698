"""Thumbnail serving: DB blobs with ETag/304 and an LRU resize cache.

(reference: api/routers/thumbnails.py:24-120)
"""

import hashlib
import io
from collections import OrderedDict

from facet_tpu.web.framework import HTTPError, Response

_RESIZE_CACHE = OrderedDict()
_RESIZE_CACHE_MAX = 512


def _resize_jpeg(blob, size):
    key = (hashlib.md5(blob[:256]).hexdigest(), len(blob), size)
    if key in _RESIZE_CACHE:
        _RESIZE_CACHE.move_to_end(key)
        return _RESIZE_CACHE[key]
    from PIL import Image

    img = Image.open(io.BytesIO(blob))
    img.thumbnail((size, size))
    buf = io.BytesIO()
    img.convert("RGB").save(buf, "JPEG", quality=80)
    out = buf.getvalue()
    _RESIZE_CACHE[key] = out
    if len(_RESIZE_CACHE) > _RESIZE_CACHE_MAX:
        _RESIZE_CACHE.popitem(last=False)
    return out


def _blob_response(request, blob, size=None):
    if size:
        try:
            blob = _resize_jpeg(blob, size)
        except Exception:
            pass
    etag = f'"{hashlib.md5(blob).hexdigest()}"'
    if request.headers.get("if-none-match") == etag:
        return Response(b"", status=304, headers={"ETag": etag})
    return Response(blob, content_type="image/jpeg",
                    headers={"ETag": etag,
                             "Cache-Control": "private, max-age=86400"})


def register(app, ctx):
    @app.get("/api/thumbnail")
    def thumbnail_query(request):
        """Query-param form (the reference's signature,
        api/routers/thumbnails.py:67 `GET /api/thumbnail?path=`) so
        migrating clients work unchanged."""
        path = request.param("path")
        if not path:
            raise HTTPError(400, "path required")
        return thumbnail(request, path)

    @app.get("/api/thumbnail/{path:path}")
    def thumbnail(request, path):
        full = path if path.startswith("/") else "/" + path
        size = request.param("size", type=int)
        with ctx.connection() as conn:
            row = conn.execute("SELECT thumbnail FROM photos WHERE path = ?",
                               (full,)).fetchone()
        if row is None or not row[0]:
            raise HTTPError(404, "no thumbnail")
        return _blob_response(request, row[0], size)

    @app.get("/api/face_thumbnail/{face_id:int}")
    def face_thumbnail(request, face_id):
        with ctx.connection() as conn:
            row = conn.execute(
                "SELECT face_thumbnail FROM faces WHERE id = ?", (face_id,)).fetchone()
            if row is None:
                raise HTTPError(404, "face not found")
            if row[0]:
                return _blob_response(request, row[0])
            # no stored blob: crop on the fly from the photo's thumbnail
            # using viewer.face_thumbnails, like the reference
            # (api/routers/thumbnails.py:145-165)
            face = conn.execute(
                "SELECT f.bbox_x1, f.bbox_y1, f.bbox_x2, f.bbox_y2,"
                " p.thumbnail, p.image_width FROM faces f"
                " JOIN photos p ON p.path = f.photo_path"
                " WHERE f.id = ?", (face_id,)).fetchone()
        if face is None:       # orphaned face: photo row gone
            raise HTTPError(404, "no face thumbnail")
        blob = _face_crop(face)
        if blob is None:
            raise HTTPError(404, "no face thumbnail")
        return _blob_response(request, blob)

    def _face_crop(face):
        """(bbox..., photo thumbnail blob, full width) -> JPEG bytes or
        None, per viewer.face_thumbnails."""
        import io

        from PIL import Image

        from facet_tpu.faces.crop import crop_face_jpeg

        x1, y1, x2, y2, thumb_blob, full_w = face
        if not thumb_blob:
            return None
        ft = ctx.config.viewer.get("face_thumbnails", {})
        img = Image.open(io.BytesIO(thumb_blob)).convert("RGB")
        return crop_face_jpeg(
            img, (x1, y1, x2, y2),
            scale=img.width / full_w if full_w else 1.0,
            pad=ft.get("crop_padding_ratio", 0.2),
            out_px=ft.get("output_size_px", 64),
            quality=ft.get("jpeg_quality", 80),
            min_px=ft.get("min_crop_size_px", 20))

    @app.get("/api/person_thumbnail/{person_id:int}")
    def person_thumbnail(request, person_id):
        with ctx.connection() as conn:
            row = conn.execute(
                "SELECT face_thumbnail FROM persons WHERE id = ?",
                (person_id,)).fetchone()
            if row is None or not row[0]:
                row = conn.execute(
                    "SELECT face_thumbnail FROM faces WHERE person_id = ?"
                    " AND face_thumbnail IS NOT NULL LIMIT 1", (person_id,)).fetchone()
        if row is None or not row[0]:
            raise HTTPError(404, "no person thumbnail")
        return _blob_response(request, row[0])

    @app.get("/api/image")
    def full_image_query(request):
        """Query-param form (reference api/routers/thumbnails.py:214
        `GET /api/image?path=`) for migrating clients."""
        path = request.param("path")
        if not path:
            raise HTTPError(400, "path required")
        return full_image(request, path)

    @app.get("/api/image/{path:path}")
    def full_image(request, path):
        """Serve the original file when it is readable from this host."""
        import os

        full = ctx.config.map_path(path if path.startswith("/") else "/" + path)
        with ctx.connection() as conn:
            known = conn.execute("SELECT 1 FROM photos WHERE path = ?",
                                 (path if path.startswith("/") else "/" + path,)
                                 ).fetchone()
        if known is None:
            raise HTTPError(404, "unknown photo")
        if not os.path.isfile(full):
            raise HTTPError(404, "original file not accessible")
        import mimetypes

        ctype = mimetypes.guess_type(full)[0] or "image/jpeg"
        with open(full, "rb") as fh:
            return Response(fh.read(), content_type=ctype)
