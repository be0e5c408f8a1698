"""Blink recompute from stored 106-point landmarks.

"~100x faster" than re-reading thumbnails in the reference
(processing/scorer.py:1360-1437): all landmark blobs load from the DB, EAR
evaluates vectorized, photos.is_blink updates, aggregates refresh.
"""

import numpy as np

from facet_tpu.db.connection import get_connection
from facet_tpu.models.face_pipeline import average_ear


def recompute_blinks(db_path, config, update_aggregates=True, verbose=True):
    threshold = config.get_face_detection_settings().get("blink_ear_threshold", 0.21)
    with get_connection(db_path) as conn:
        rows = conn.execute(
            "SELECT photo_path, landmark_2d_106 FROM faces"
            " WHERE landmark_2d_106 IS NOT NULL").fetchall()
        blink_by_photo = {}
        for path, blob in rows:
            if len(blob) != 106 * 2 * 4:
                continue
            landmarks = np.frombuffer(blob, np.float32).reshape(106, 2)
            is_blink = average_ear(landmarks) < threshold
            blink_by_photo[path] = blink_by_photo.get(path, False) or is_blink
        # reset first, exactly like the reference (scorer.py:1430): a stale
        # is_blink=1 on a photo whose faces carry no (valid) landmarks
        # would otherwise survive every recompute and keep depressing its
        # aggregate via the blink penalty
        prev_flagged = {path for (path,) in conn.execute(
            "SELECT path FROM photos WHERE is_blink = 1")}
        conn.execute("UPDATE photos SET is_blink = 0 WHERE face_count >= 1")
        conn.executemany(
            "UPDATE photos SET is_blink = ? WHERE path = ?",
            [(1 if blink else 0, path) for path, blink in blink_by_photo.items()])
    # the aggregate refresh must fire whenever ANY flag changed — including
    # stale 1 -> 0 clears on photos with no (valid) landmarks left, where
    # blink_by_photo is empty but the blink penalty is still baked into the
    # aggregate (sixth-review-pass finding)
    flags_changed = (
        any(not blink_by_photo.get(path, False) for path in prev_flagged)
        or any(blink and path not in prev_flagged
               for path, blink in blink_by_photo.items()))
    if update_aggregates and flags_changed:
        from facet_tpu.processing.scorer import Facet

        Facet(db_path, config, lightweight=True).update_all_aggregates(
            rescore_embeddings=False)
    if verbose:
        blinks = sum(blink_by_photo.values())
        print(f"blink recompute: {blinks}/{len(blink_by_photo)} photos flagged")
    return len(blink_by_photo)
