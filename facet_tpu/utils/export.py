"""CSV/JSON export of the score table (reference: photos.py:703-780)."""

import csv
import json

from facet_tpu.db.connection import get_connection

EXPORT_COLUMNS = [
    "path", "filename", "date_taken", "camera_model", "lens_model", "iso",
    "f_stop", "shutter_speed", "focal_length", "aggregate", "aesthetic",
    "quality_score", "topiq_score", "tech_sharpness", "color_score",
    "exposure_score", "comp_score", "contrast_score", "dynamic_range_stops",
    "noise_sigma", "face_count", "face_quality", "eye_sharpness", "face_ratio",
    "is_blink", "is_monochrome", "is_silhouette", "is_burst_lead",
    "star_rating", "is_favorite", "is_rejected", "tags", "category",
    "composition_pattern", "phash", "config_version",
]


def export_photos(db_path, fmt="csv", out_path=None, order_by="aggregate DESC"):
    out_path = out_path or f"photo_scores.{fmt}"
    with get_connection(db_path) as conn:
        cols = ", ".join(EXPORT_COLUMNS)
        rows = conn.execute(
            f"SELECT {cols} FROM photos ORDER BY {order_by}").fetchall()
    if fmt == "csv":
        with open(out_path, "w", newline="") as fh:
            writer = csv.writer(fh)
            writer.writerow(EXPORT_COLUMNS)
            writer.writerows([list(r) for r in rows])
    elif fmt == "json":
        with open(out_path, "w") as fh:
            json.dump([dict(zip(EXPORT_COLUMNS, r)) for r in rows], fh, indent=1)
    else:
        raise ValueError(f"unknown export format: {fmt}")
    return out_path
