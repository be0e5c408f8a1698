"""Facet: the core scoring engine.

Batch pipeline (reference single-image version: processing/scorer.py:952-1146,
re-designed batch-first for TPU):

1. host: decode images + EXIF;
2. device: fused technical statistics (one program per image shape);
3. device: pHash (three matmuls per image);
4. device: CLIP forward + aesthetic head over the preprocessed crop batch;
5. host: faces (when the face pipeline is loaded) and composition geometry;
6. tags from the CLIP embedding, category routing, aggregate score;
7. one-transaction batch persistence with thumbnails + photo_tags sync.

All raw metrics/embeddings/histograms persist, so update_all_aggregates()
re-scores the whole library from the DB without touching an image — the
vectorized scoring kernel handles every row in one device call.
"""

import os
import shutil
import time

import numpy as np

from facet_tpu.analyzers.composition import CompositionAnalyzer
from facet_tpu.analyzers.technical import (
    TechnicalAnalyzer,
    exposure_from_histogram_blob,
    recompute_exposure_score,
)
from facet_tpu.config.scoring_config import ScoringConfig
from facet_tpu.db.connection import get_connection
from facet_tpu.db.schema import init_database
from facet_tpu.db.tags import sync_photo_tags
from facet_tpu.models.model_manager import ModelManager
from facet_tpu.ops.phash import phash_batch
from facet_tpu.scoring.brain import calculate_aggregate
from facet_tpu.scoring.vectorized import AggregateScorer
from facet_tpu.utils.exif import get_exif_batch
from facet_tpu.utils.image_loading import load_image
from facet_tpu.utils.tags import tags_to_string
from facet_tpu.utils.thumbnails import make_thumbnail

# Columns written by save_photos_batch, in insert order.
ROW_COLUMNS = [
    "path", "filename", "date_taken", "camera_model", "lens_model", "iso",
    "f_stop", "shutter_speed", "focal_length", "focal_length_35mm",
    "image_width", "image_height", "aesthetic", "face_count", "face_quality",
    "eye_sharpness", "face_sharpness", "face_ratio", "tech_sharpness",
    "color_score", "exposure_score", "comp_score", "isolation_bonus",
    "aggregate", "is_blink", "is_monochrome", "is_silhouette",
    "is_group_portrait", "is_burst_lead", "clip_embedding",
    "raw_sharpness_variance", "histogram_data", "histogram_spread",
    "mean_luminance", "histogram_bimodality", "power_point_score",
    "raw_color_entropy", "raw_eye_sharpness", "shadow_clipped",
    "highlight_clipped", "dynamic_range_stops", "noise_sigma",
    "contrast_score", "mean_saturation", "leading_lines_score",
    "face_confidence", "thumbnail", "phash", "config_version", "tags",
    "quality_score", "topiq_score", "composition_explanation",
    "scoring_model", "composition_pattern", "category",
]


class Facet:
    """Scoring engine bound to one database + one scoring config."""

    def __init__(self, db_path="photo_scores_pro.db", config=None,
                 config_path=None, lightweight=False, multi_pass=False,
                 model_manager=None):
        self.db_path = db_path
        init_database(db_path)
        self.config = config or ScoringConfig(config_path)
        self.config.check_vram_profile_compatibility(verbose=False)
        self.lightweight = lightweight
        self.multi_pass = multi_pass

        self.technical = TechnicalAnalyzer(self.config)
        self.composition = CompositionAnalyzer(self.config)
        self.models = model_manager or ModelManager(self.config)
        self._tagger = None
        self._aggregate_scorer = None
        self._fused = None

        processing = self.config.get_processing_settings()
        thumbs = processing.get("thumbnails", {})
        self.thumb_size = thumbs.get("photo_size", 640)
        self.thumb_quality = thumbs.get("photo_quality", 80)

    # ------------------------------------------------------------ lazy deps

    @property
    def aesthetic_model(self):
        """CLIP + aesthetic head (loaded on demand; deferred in multi-pass)."""
        return self.models.load_model("clip")

    @property
    def face_pipeline(self):
        try:
            return self.models.load_model("insightface")
        except Exception:
            return None

    @property
    def tagger(self):
        if self._tagger is None:
            from facet_tpu.models.tagger import CLIPTagger

            self._tagger = CLIPTagger(self.config)
        return self._tagger

    @property
    def aggregate_scorer(self):
        if self._aggregate_scorer is None:
            self._aggregate_scorer = AggregateScorer(self.config)
        return self._aggregate_scorer

    def _fused_scorer(self):
        if self._fused is None:
            from facet_tpu.processing.device_pipeline import FusedScorer

            fast = (bool(self.config.get_processing_settings().get(
                "fast_color_harmony", False))
                or self.config.speed_tier() == "fast")
            self._fused = FusedScorer.from_aesthetic_scorer(
                self.aesthetic_model, hs_subsample=4 if fast else 1)
        return self._fused

    def release_fused(self):
        """Drop the fused scorer's device references (CLIP params, compiled
        pipelines, mesh-placed copies) so unloading the 'clip' model
        actually frees its HBM — without this, the multi-pass HBM budget
        is violated while later passes load (round-4 review finding)."""
        self._fused = None

    # --------------------------------------------------------------- scoring

    def score_paths(self, paths, with_faces=True, with_aesthetic=True,
                    with_composition=True, with_tags=True):
        """Full pipeline over a batch of file paths.

        Returns (rows, errors): row dicts keyed by ROW_COLUMNS, and
        {path: error} for files that failed to load.
        """
        images, pils, ok_paths, errors = [], [], [], {}
        for path in paths:
            pil = load_image(path)
            if pil is None:
                errors[path] = "failed to load"
                continue
            arr = np.asarray(pil, dtype=np.uint8)
            if arr.ndim != 3 or arr.shape[2] != 3 or min(arr.shape[:2]) < 3:
                errors[path] = "unsupported dimensions"
                continue
            images.append(arr)
            pils.append(pil)
            ok_paths.append(path)
        if not ok_paths:
            return [], errors

        exif = get_exif_batch(ok_paths)
        rows = self.score_images(ok_paths, images, pils, exif,
                                 with_faces=with_faces,
                                 with_aesthetic=with_aesthetic,
                                 with_composition=with_composition,
                                 with_tags=with_tags)
        return rows, errors

    def score_images(self, paths, images, pils, exif_map, with_faces=True,
                     with_aesthetic=True, with_composition=True, with_tags=True):
        """Score pre-decoded images (the multi-pass chunk path)."""
        n = len(paths)
        pipeline = (self.face_pipeline
                    if with_faces and not self.lightweight else None)
        detections = None
        if with_aesthetic and not self.lightweight:
            # fused path: ONE device program per shape computes aesthetic +
            # embedding + pHash + every technical statistic; with faces on,
            # the SCRFD detection program rides the same resident batch
            # (one transfer, back-to-back dispatch, one fetch)
            fused = self._fused_scorer()
            if pipeline is not None:
                outputs, detections = fused.score_images(
                    images, face_pipeline=pipeline)
            else:
                outputs = fused.score_images(images)
            tech = [self.technical.metrics_from_stats(o[3]) for o in outputs]
            hashes = [o[2] for o in outputs]
            aesthetics = [(o[0], o[1]) for o in outputs]
        else:
            tech = self.technical.analyze_batch(images)
            hashes = phash_batch(images)
            aesthetics = [(None, None)] * n

        face_results = [None] * n
        if pipeline is not None:
            face_results = pipeline.analyze_batch(images,
                                                  detections=detections)

        tag_lists = [[] for _ in range(n)]
        if with_tags and with_aesthetic and not self.lightweight \
                and self.config.get_tagging_settings().get("enabled", True):
            blobs = [b for _, b in aesthetics if b is not None]
            if blobs:
                tagged = self.tagger.tag_embedding_bytes(blobs)
                it = iter(tagged)
                tag_lists = [next(it) if b is not None else []
                             for _, b in aesthetics]

        rows = []
        for i, path in enumerate(paths):
            rows.append(self.assemble_row(
                path, images[i], pils[i], exif_map.get(path, {}), tech[i],
                hashes[i], aesthetics[i], face_results[i], tag_lists[i],
                with_composition=with_composition))
        return rows

    def assemble_row(self, path, image, pil, exif, tech, phash,
                      aesthetic_pair, faces, tag_hits, with_composition=True,
                      quality_score=None, quality_model=None,
                      samp_result=None, thumbnail=None):
        """Build one photos row, computing the aggregate LAST so every model
        output influences it. When a quality (NR-IQA) model ran, its score
        replaces the CLIP aesthetic in the aggregate, as in the reference
        (processing/scorer.py:1755-1765 update_quality_scores); a SAMP-Net
        result replaces the rule-based comp_score the same way."""
        h, w = image.shape[:2]
        aesthetic, embedding = aesthetic_pair
        if quality_score is not None:
            aesthetic = quality_score

        m = dict(tech)
        m["aesthetic"] = aesthetic
        m["iso"] = exif.get("iso")
        m["f_stop"] = exif.get("f_stop")
        m["shutter_speed"] = exif.get("shutter_speed")
        m["focal_length"] = exif.get("focal_length")
        m["tags"] = tags_to_string(tag_hits)

        # Face block
        group_min = self.config.get_face_detection_settings().get("min_faces_for_group", 4)
        if faces:
            m.update({
                "face_count": faces["face_count"],
                "face_quality": faces["face_quality"],
                "eye_sharpness": faces["eye_sharpness"],
                "face_sharpness": faces["face_sharpness"],
                "face_ratio": faces["face_ratio"],
                "is_blink": faces["is_blink"],
                "face_confidence": faces.get("confidence"),
                "raw_eye_sharpness": faces.get("raw_eye_sharpness"),
            })
            m["is_group_portrait"] = 1 if faces["face_count"] >= group_min else 0
            face_bbox = faces.get("combined_bbox")
        else:
            m.update({"face_count": 0, "face_quality": None, "eye_sharpness": None,
                      "face_sharpness": None, "face_ratio": 0.0, "is_blink": 0,
                      "face_confidence": None, "raw_eye_sharpness": None,
                      "is_group_portrait": 0})
            face_bbox = None

        # Composition block
        composition_pattern = None
        if samp_result is not None:
            m["comp_score"] = samp_result["score"]
            m["power_point_score"] = samp_result.get("power_point_score")
            m["leading_lines_score"] = None
            composition_pattern = samp_result.get("pattern")
        elif with_composition:
            comp = self.composition.analyze(image, face_bbox)
            m["comp_score"] = CompositionAnalyzer.integrate_leading_lines(
                comp["score"], comp["leading_lines_score"], bool(face_bbox))
            m["power_point_score"] = comp["power_point_score"]
            m["leading_lines_score"] = comp["leading_lines_score"]
        else:
            m["comp_score"] = None
            m["power_point_score"] = None
            m["leading_lines_score"] = None

        m["isolation_bonus"] = 1.0
        aggregate, category = calculate_aggregate(m, self.config)

        if quality_score is not None:
            scoring_model = quality_model or "quality"
        else:
            scoring_model = "clip-mlp" if aesthetic is not None else None
        row = {
            "path": path,
            "filename": os.path.basename(path),
            "date_taken": exif.get("date_taken"),
            "camera_model": exif.get("camera_model"),
            "lens_model": exif.get("lens_model"),
            "iso": exif.get("iso"),
            "f_stop": exif.get("f_stop"),
            "shutter_speed": exif.get("shutter_speed"),
            "focal_length": exif.get("focal_length"),
            "focal_length_35mm": exif.get("focal_length_35mm"),
            "image_width": exif.get("image_width") or w,
            "image_height": exif.get("image_height") or h,
            "aesthetic": aesthetic,
            "face_count": m["face_count"],
            "face_quality": m["face_quality"],
            "eye_sharpness": m["eye_sharpness"],
            "face_sharpness": m["face_sharpness"],
            "face_ratio": m["face_ratio"],
            "tech_sharpness": tech["tech_sharpness"],
            "color_score": tech["color_score"],
            "exposure_score": tech["exposure_score"],
            "comp_score": m["comp_score"],
            "isolation_bonus": m["isolation_bonus"],
            "aggregate": round(aggregate, 2),
            "is_blink": m["is_blink"],
            "is_monochrome": tech["is_monochrome"],
            "is_silhouette": tech["is_silhouette"],
            "is_group_portrait": m["is_group_portrait"],
            "is_burst_lead": 1,  # bursts re-flag after the scan
            "clip_embedding": embedding,
            "raw_sharpness_variance": tech["raw_sharpness_variance"],
            "histogram_data": tech["histogram_data"],
            "histogram_spread": tech["histogram_spread"],
            "mean_luminance": tech["mean_luminance"],
            "histogram_bimodality": tech["histogram_bimodality"],
            "power_point_score": m["power_point_score"],
            "raw_color_entropy": tech["raw_color_entropy"],
            "raw_eye_sharpness": m["raw_eye_sharpness"],
            "shadow_clipped": tech["shadow_clipped"],
            "highlight_clipped": tech["highlight_clipped"],
            "dynamic_range_stops": tech["dynamic_range_stops"],
            "noise_sigma": tech["noise_sigma"],
            "contrast_score": tech["contrast_score"],
            "mean_saturation": tech["mean_saturation"],
            "leading_lines_score": m["leading_lines_score"],
            "face_confidence": m["face_confidence"],
            # multi-pass precomputes thumbnails per chunk through the
            # native threaded encoder when built (utils/native_decode
            # encode_thumbnail_batch); the PIL path is the per-image
            # fallback and the single-pass default
            "thumbnail": thumbnail if thumbnail is not None else
                         make_thumbnail(pil, self.thumb_size,
                                        self.thumb_quality),
            "phash": phash,
            "config_version": self.config.version_hash,
            "tags": m["tags"],
            "quality_score": quality_score,
            "topiq_score": quality_score,
            "composition_explanation": None,
            "scoring_model": scoring_model,
            "composition_pattern": composition_pattern,
            "category": category,
            "_faces": faces["rows"] if faces else [],
        }
        return row

    # ------------------------------------------------------------ persistence

    def save_photos_batch(self, rows, update_only=None):
        """Single-transaction batch insert incl. face rows + tag sync.

        Uses an UPSERT, NOT the reference's INSERT OR REPLACE
        (processing/scorer.py:1621): REPLACE deletes the conflicting row
        first, and with PRAGMA foreign_keys=ON that delete CASCADES —
        silently destroying the photo's comparison votes, duplicate pairs,
        recommendation history, and face person assignments on every
        --force rescan (the reference has exactly this data-loss bug; a
        deliberate divergence, pinned in tests/test_db.py). Column values
        written are identical to REPLACE semantics.

        update_only: optional iterable of column names — an EXISTING row
        then only has those columns overwritten (single-pass semantics:
        models that did not run must not clobber stored scores); new rows
        still insert in full.
        """
        if not rows:
            return 0
        cols = ", ".join(ROW_COLUMNS)
        placeholders = ", ".join("?" for _ in ROW_COLUMNS)
        writable = [c for c in ROW_COLUMNS if c != "path"]
        if update_only is not None:
            keep = set(update_only)
            writable = [c for c in writable if c in keep]
        sets = ", ".join(f"{c} = excluded.{c}" for c in writable)
        sql = (f"INSERT INTO photos ({cols}) VALUES ({placeholders}) "
               f"ON CONFLICT(path) DO UPDATE SET {sets}")
        sync_tags = update_only is None or "tags" in set(update_only)
        with get_connection(self.db_path) as conn:
            for row in rows:
                conn.execute(sql, [row.get(c) for c in ROW_COLUMNS])
                if sync_tags:
                    sync_photo_tags(conn, row["path"], row.get("tags"))
                faces = row.get("_faces") or []
                if faces:
                    conn.execute("DELETE FROM faces WHERE photo_path = ?", (row["path"],))
                    conn.executemany(
                        "INSERT OR REPLACE INTO faces (photo_path, face_index, embedding,"
                        " bbox_x1, bbox_y1, bbox_x2, bbox_y2, confidence,"
                        " face_thumbnail, landmark_2d_106)"
                        " VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                        [(row["path"], f["face_index"], f["embedding"],
                          f["bbox"][0], f["bbox"][1], f["bbox"][2], f["bbox"][3],
                          f["confidence"], f.get("thumbnail"), f.get("landmarks"))
                         for f in faces])
        return len(rows)

    def update_columns(self, updates):
        """{path: {column: value}} partial update (multi-pass passes)."""
        if not updates:
            return
        with get_connection(self.db_path) as conn:
            for path, fields in updates.items():
                cols = ", ".join(f"{c} = ?" for c in fields)
                conn.execute(f"UPDATE photos SET {cols} WHERE path = ?",
                             list(fields.values()) + [path])
                if "tags" in fields:
                    sync_photo_tags(conn, path, fields["tags"])

    def get_already_scanned_set(self):
        with get_connection(self.db_path) as conn:
            return {r[0] for r in conn.execute(
                "SELECT path FROM photos WHERE aggregate IS NOT NULL")}

    def backup_database(self, keep=3):
        """Timestamped copy next to the DB, keeping the newest `keep`."""
        if not os.path.exists(self.db_path):
            return None
        stamp = time.strftime("%Y%m%d_%H%M%S")
        backup = f"{self.db_path}.backup_{stamp}"
        shutil.copy2(self.db_path, backup)
        backups = sorted(
            f for f in os.listdir(os.path.dirname(self.db_path) or ".")
            if f.startswith(os.path.basename(self.db_path) + ".backup_"))
        base = os.path.dirname(self.db_path) or "."
        for old in backups[:-keep]:
            try:
                os.remove(os.path.join(base, old))
            except OSError:
                pass
        return backup

    # ------------------------------------------------------------- recompute

    def update_all_aggregates(self, rescore_embeddings=True, verbose=False,
                              paths=None):
        """Re-score the library from stored raw data (no image IO).

        Vectorized path: one device call for aesthetic-from-embedding, one
        for the aggregate math over all rows. `paths` restricts the
        recompute to those rows (single-pass post-merge); percentile
        normalization still derives its scales from the WHOLE library
        (PercentileNormalizer reads the DB itself). Thumbnails are
        excluded from the load — the recompute never reads them and at
        library scale they dominate the SELECT * memory cost.
        """
        cols = ", ".join(c for c in ROW_COLUMNS if c != "thumbnail")
        with get_connection(self.db_path) as conn:
            if paths is None:
                rows = [dict(r) for r in conn.execute(
                    f"SELECT {cols} FROM photos")]
            else:
                rows = []
                chunk = sorted(paths)
                for start in range(0, len(chunk), 500):
                    part = chunk[start:start + 500]
                    marks = ", ".join("?" for _ in part)
                    rows.extend(dict(r) for r in conn.execute(
                        f"SELECT {cols} FROM photos WHERE path IN ({marks})",
                        part))
        if not rows:
            return 0

        group_min = self.config.get_face_detection_settings().get("min_faces_for_group", 4)

        # aesthetic refresh from stored embeddings, one device call
        if rescore_embeddings and not self.lightweight:
            try:
                scorer = self.models.load_model("clip")
                embs, idxs = [], []
                for i, row in enumerate(rows):
                    # rows scored by a quality model keep that aesthetic —
                    # re-deriving from the CLIP embedding would silently
                    # downgrade them to the weaker CLIP-MLP signal
                    if row.get("scoring_model") not in (None, "", "clip-mlp"):
                        continue
                    blob = row.get("clip_embedding")
                    if blob and len(blob) == 768 * 4:
                        embs.append(np.frombuffer(blob, np.float32))
                        idxs.append(i)
                if embs:
                    scores = scorer.score_from_embeddings_batch(np.stack(embs))
                    for i, s in zip(idxs, scores):
                        rows[i]["aesthetic"] = float(s)
            except Exception:
                pass  # no CLIP available: keep stored aesthetic values

        # percentile normalization: re-derive scale-dependent scores from the
        # stored raw metrics against the library's current percentiles
        # (reference: config/percentile_normalizer.py via scorer.py:1148+)
        normalizer = None
        if self.config.get_normalization_settings().get("method") == "percentile":
            from facet_tpu.config.percentile_normalizer import (
                RAW_METRICS,
                PercentileNormalizer,
            )

            normalizer = PercentileNormalizer(self.db_path, self.config)
            normalizer.compute_percentiles()
            if normalizer.per_category:
                normalizer.compute_percentiles_per_category()

        # Reference semantics (processing/scorer.py:1199-1283, parity-tested
        # in tests/test_reference_parity.py::TestRecomputeParity):
        # normalization is TRANSIENT (feeds the aggregate, never persisted),
        # uses the category determined from the stored row (before the
        # group-portrait refresh), covers exactly the three raw->score
        # metrics, and is unrounded; the exposure refresh keeps the STORED
        # bimodality/silhouette/clipping flags and recomputes only the
        # score; only aggregate / category / is_group_portrait /
        # exposure_score / config_version are written back.
        from facet_tpu.scoring.brain import determine_photo_category

        recompute_metrics = {"raw_sharpness_variance": "tech_sharpness",
                             "raw_color_entropy": "color_score",
                             "raw_eye_sharpness": "eye_sharpness"}
        for row in rows:
            if normalizer is not None and normalizer.ready():
                category0 = determine_photo_category(row, self.config)
                for raw_col, score_col in recompute_metrics.items():
                    value = row.get(raw_col)
                    if value is None or not isinstance(value, (int, float)):
                        continue
                    normalized = normalizer.normalize(
                        raw_col, value,
                        category=category0 if normalizer.per_category else None)
                    if normalized is not None:
                        row[score_col] = normalized
            fc = row.get("face_count") or 0
            row["is_group_portrait"] = 1 if fc >= group_min else 0
            refreshed = recompute_exposure_score(
                row.get("histogram_data"),
                row.get("histogram_bimodality"), row.get("is_silhouette", 0))
            if refreshed is not None:
                row["exposure_score"] = refreshed

        scores, categories = self.aggregate_scorer.score_rows(rows)

        with get_connection(self.db_path) as conn:
            conn.executemany(
                "UPDATE photos SET aggregate = ?, config_version = ?,"
                " category = ?, is_group_portrait = ?, exposure_score = ?"
                " WHERE path = ?",
                [(round(float(scores[i]), 2), self.config.version_hash,
                  categories[i], rows[i].get("is_group_portrait"),
                  # a recomputed 0.0 is a legitimate worst-exposure value —
                  # `or 5.0` would silently bump it (reference keeps 0.0:
                  # scorer.py:1276)
                  round(5.0 if rows[i].get("exposure_score") is None
                        else float(rows[i]["exposure_score"]), 4),
                  rows[i]["path"])
                 for i in range(len(rows))])
        if verbose:
            print(f"recomputed aggregates for {len(rows)} photos")
        return len(rows)

    def _stored_thumbnails(self, where="thumbnail IS NOT NULL"):
        """-> (paths, decoded RGB arrays) for rows with a usable thumbnail."""
        from facet_tpu.utils.thumbnails import decode_thumbnail

        with get_connection(self.db_path) as conn:
            rows = conn.execute(
                f"SELECT path, thumbnail FROM photos WHERE {where}").fetchall()
        paths, images = [], []
        for path, blob in rows:
            arr = decode_thumbnail(blob)
            if arr is not None and min(arr.shape[:2]) >= 3:
                paths.append(path)
                images.append(arr)
        return paths, images

    def score_topiq_from_thumbnails(self, batch_size=32, verbose=True):
        """Backfill topiq_score/quality_score from stored thumbnails
        (reference: photos.py:436-500 --score-topiq). No original-file IO."""
        model = self.models.load_model("topiq")
        paths, images = self._stored_thumbnails(
            "thumbnail IS NOT NULL AND topiq_score IS NULL")
        done = 0
        for start in range(0, len(paths), batch_size):
            chunk_paths = paths[start:start + batch_size]
            scores = model.score_batch(images[start:start + batch_size])
            # the quality score also replaces aesthetic so it drives the
            # aggregate (reference: processing/scorer.py:1755-1765)
            self.update_columns({
                p: {"topiq_score": s, "quality_score": s, "aesthetic": s,
                    "scoring_model": "topiq"}
                for p, s in zip(chunk_paths, scores)})
            done += len(chunk_paths)
            if verbose and done % (batch_size * 4) == 0:
                print(f"  topiq backfill {done}/{len(paths)}")
        if done:
            self.update_all_aggregates(rescore_embeddings=False)
        if verbose:
            print(f"topiq backfill complete: {done} photos")
        return done

    def rescan_composition_from_thumbnails(self, batch_size=32, verbose=True):
        """Re-run SAMP-Net composition from stored thumbnails
        (reference: processing/scorer.py:1439-1538)."""
        model = self.models.load_model("samp_net")
        paths, images = self._stored_thumbnails()
        done = 0
        for start in range(0, len(paths), batch_size):
            chunk_paths = paths[start:start + batch_size]
            results = model.score_batch(images[start:start + batch_size])
            self.update_columns({
                p: {"comp_score": r["score"],
                    "composition_pattern": r["pattern"],
                    "power_point_score": r["power_point_score"]}
                for p, r in zip(chunk_paths, results)})
            done += len(chunk_paths)
        if done:
            self.update_all_aggregates(rescore_embeddings=False)
        if verbose:
            print(f"composition rescan complete: {done} photos")
        return done

    def recompute_categories(self, verbose=True):
        """Re-run category routing + aggregates only (no normalization)."""
        cols = ", ".join(c for c in ROW_COLUMNS if c != "thumbnail")
        with get_connection(self.db_path) as conn:
            rows = [dict(r) for r in conn.execute(
                f"SELECT {cols} FROM photos WHERE aggregate IS NOT NULL")]
        if not rows:
            return 0
        scores, categories = self.aggregate_scorer.score_rows(rows)
        with get_connection(self.db_path) as conn:
            conn.executemany(
                "UPDATE photos SET category = ?, aggregate = ?,"
                " config_version = ? WHERE path = ?",
                [(categories[i], round(float(scores[i]), 2),
                  self.config.version_hash, rows[i]["path"])
                 for i in range(len(rows))])
        if verbose:
            print(f"recomputed categories for {len(rows)} photos")
        return len(rows)

    def retag_with_vlm(self, only_untagged=False, batch_size=16, verbose=True):
        """Re-tag photos with the configured VLM tagger from stored
        thumbnails (reference: photos.py --recompute-tags-vlm). Falls back
        down the tagger chain when the preferred model is unavailable;
        categories + aggregates recompute afterwards since tags drive
        category routing."""
        from PIL import Image as PILImage

        model = None
        for name in ("vlm_tagger", "qwen3_vl_tagger", "ram_tagger"):
            try:
                model = self.models.load_model(name)
                break
            except Exception as exc:
                if verbose:
                    print(f"  {name}: unavailable ({exc})")
        if model is None:
            print("no VLM/RAM tagger available (weights not installed);"
                  " use --recompute-tags for CLIP tagging")
            return 0

        where = "thumbnail IS NOT NULL"
        if only_untagged:
            where += " AND (tags IS NULL OR tags = '')"
        paths, images = self._stored_thumbnails(where)
        done = 0
        for start in range(0, len(paths), batch_size):
            chunk_paths = paths[start:start + batch_size]
            pils = [PILImage.fromarray(img)
                    for img in images[start:start + batch_size]]
            tag_lists = model.tag_batch(pils)
            self.update_columns({
                p: {"tags": tags_to_string([(t, 1.0) for t in tags])}
                for p, tags in zip(chunk_paths, tag_lists)})
            done += len(chunk_paths)
            if verbose and done % (batch_size * 4) == 0:
                print(f"  vlm retag {done}/{len(paths)}")
        if done:
            self.recompute_categories(verbose=verbose)
        if verbose:
            print(f"vlm retag complete: {done} photos")
        return done

    def retag_from_embeddings(self, only_untagged=True, verbose=False):
        """Re-run zero-shot tagging from stored CLIP embeddings (no images)."""
        where = "clip_embedding IS NOT NULL"
        if only_untagged:
            where += " AND (tags IS NULL OR tags = '')"
        with get_connection(self.db_path) as conn:
            rows = conn.execute(
                f"SELECT path, clip_embedding FROM photos WHERE {where}").fetchall()
        if not rows:
            return 0
        blobs = [r["clip_embedding"] for r in rows]
        tag_lists = self.tagger.tag_embedding_bytes(blobs)
        updates = {r["path"]: {"tags": tags_to_string(t)}
                   for r, t in zip(rows, tag_lists)}
        self.update_columns(updates)
        if verbose:
            print(f"tagged {len(updates)} photos from stored embeddings")
        return len(updates)
