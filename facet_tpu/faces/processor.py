"""Face extraction / thumbnail refill pipeline.

Producer -> worker threads -> batched DB writes, covering the reference's
FaceProcessor roles (faces/processor.py:27-324):
- 'extract': run the face pipeline for photos with no face rows (from the
  original file when readable, else the stored 640px thumbnail with bbox
  coordinates scaled back to full resolution);
- 'refill': regenerate face crop thumbnails from stored bboxes.
"""

from facet_tpu.db.connection import get_connection
from facet_tpu.utils.image_loading import load_image_rgb
from facet_tpu.utils.thumbnails import decode_thumbnail


class FaceProcessor:
    def __init__(self, db_path, config, pipeline=None):
        self.db_path = db_path
        self.config = config
        self._pipeline = pipeline
        settings = config.get_face_processing_settings()
        self.extract_batch = settings.get("extract_batch_size", 16)
        self.refill_batch = settings.get("refill_batch_size", 100)
        self.use_db_thumbnails = settings.get("use_db_thumbnails", True)

    @property
    def pipeline(self):
        if self._pipeline is None:
            from facet_tpu.models.face_pipeline import FacePipeline

            self._pipeline = FacePipeline.create(self.config)
        return self._pipeline

    # --------------------------------------------------------------- extract

    def run_extract(self, force=False, batch_size=None, verbose=True):
        batch_size = batch_size or self.extract_batch
        with get_connection(self.db_path) as conn:
            if force:
                paths = [r[0] for r in conn.execute("SELECT path FROM photos")]
                conn.execute("DELETE FROM faces")
            else:
                paths = [r[0] for r in conn.execute(
                    "SELECT p.path FROM photos p"
                    " LEFT JOIN faces f ON f.photo_path = p.path"
                    " WHERE f.id IS NULL")]
        processed = 0
        for start in range(0, len(paths), batch_size):
            chunk = paths[start:start + batch_size]
            images, ok_paths, scales = [], [], []
            with get_connection(self.db_path) as conn:
                for path in chunk:
                    img = load_image_rgb(path)
                    scale = 1.0
                    if img is None and self.use_db_thumbnails:
                        row = conn.execute(
                            "SELECT thumbnail, image_width FROM photos WHERE path = ?",
                            (path,)).fetchone()
                        if row and row[0]:
                            img = decode_thumbnail(row[0])
                            if img is not None and row[1]:
                                scale = row[1] / img.shape[1]
                    if img is None:
                        continue
                    images.append(img)
                    ok_paths.append(path)
                    scales.append(scale)
            if not images:
                continue
            results = self.pipeline.analyze_batch(images)
            self._write_extracted(ok_paths, results, scales)
            processed += len(ok_paths)
            if verbose and processed % (batch_size * 4) == 0:
                print(f"  faces extracted for {processed}/{len(paths)} photos")
        return processed

    def _write_extracted(self, paths, results, scales):
        group_min = self.config.get_face_detection_settings().get(
            "min_faces_for_group", 4)
        with get_connection(self.db_path) as conn:
            for path, res, scale in zip(paths, results, scales):
                conn.execute("DELETE FROM faces WHERE photo_path = ?", (path,))
                for f in res["rows"]:
                    bbox = [int(round(v * scale)) for v in f["bbox"]]
                    conn.execute(
                        "INSERT OR REPLACE INTO faces (photo_path, face_index,"
                        " embedding, bbox_x1, bbox_y1, bbox_x2, bbox_y2,"
                        " confidence, face_thumbnail, landmark_2d_106)"
                        " VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                        (path, f["face_index"], f["embedding"], *bbox,
                         f["confidence"], f.get("thumbnail"), f.get("landmarks")))
                conn.execute(
                    "UPDATE photos SET face_count = ?, face_quality = ?,"
                    " eye_sharpness = ?, face_sharpness = ?, face_ratio = ?,"
                    " is_blink = ?, face_confidence = ?, raw_eye_sharpness = ?,"
                    " is_group_portrait = ? WHERE path = ?",
                    (res["face_count"], res["face_quality"], res["eye_sharpness"],
                     res["face_sharpness"], res["face_ratio"], res["is_blink"],
                     res["confidence"], res["raw_eye_sharpness"],
                     1 if res["face_count"] >= group_min else 0, path))

    # ---------------------------------------------------------------- refill

    def run_refill(self, verbose=True):
        """Regenerate face thumbnails from stored bboxes (RAW-safe scaling)."""
        from PIL import Image

        from facet_tpu.faces.crop import crop_face_jpeg

        # the offline refill reads face_processing (the reference's
        # refill_face_thumbnails, faces/clusterer.py:576-590);
        # viewer.face_thumbnails governs only the API's on-the-fly crops
        settings = self.config.get_face_processing_settings()
        pad = settings.get("crop_padding", 0.3)
        quality = settings.get("face_thumbnail_quality", 90)
        out_px = settings.get("face_thumbnail_size", 128)
        min_px = 0
        refreshed = 0
        with get_connection(self.db_path) as conn:
            # metadata only — the per-photo thumbnail blob loads lazily and
            # only when the original file is gone (a 100k-face backlog
            # would otherwise pull GBs of blobs into one fetchall), and
            # each photo's image decodes ONCE for all of its faces
            faces = conn.execute(
                "SELECT f.id, f.photo_path, f.bbox_x1, f.bbox_y1, f.bbox_x2,"
                " f.bbox_y2, p.image_width"
                " FROM faces f JOIN photos p ON p.path = f.photo_path"
                " WHERE f.face_thumbnail IS NULL"
                " ORDER BY f.photo_path").fetchall()
            img, scale, img_path, pending = None, 1.0, None, 0
            for fid, path, x1, y1, x2, y2, full_w in faces:
                if path != img_path:
                    img_path = path
                    img = load_image_rgb(path)
                    scale = 1.0
                    if img is None and self.use_db_thumbnails:
                        row = conn.execute(
                            "SELECT thumbnail FROM photos WHERE path = ?",
                            (path,)).fetchone()
                        if row and row[0]:
                            img = decode_thumbnail(row[0])
                            if img is not None and full_w:
                                scale = img.shape[1] / full_w
                if img is None or None in (x1, y1, x2, y2):
                    continue
                blob = crop_face_jpeg(
                    Image.fromarray(img), (x1, y1, x2, y2), scale=scale,
                    pad=pad, out_px=out_px, quality=quality, min_px=min_px)
                if blob is None:
                    continue
                conn.execute("UPDATE faces SET face_thumbnail = ? WHERE id = ?",
                             (blob, fid))
                refreshed += 1
                pending += 1
                if pending >= self.refill_batch:
                    conn.commit()
                    pending = 0
        if verbose:
            print(f"refilled {refreshed} face thumbnails")
        return refreshed
