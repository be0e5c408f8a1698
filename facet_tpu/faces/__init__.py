"""Face recognition subsystem: clustering, person management, blink recompute.

- FaceClusterer: embeddings -> persons via HDBSCAN over a device-computed
  pairwise distance matrix (the cuML/hdbscan role in the reference,
  faces/clusterer.py:39-520).
- FaceProcessor: producer/consumer extraction + thumbnail refill.
- merge_analyzer: Union-Find person-merge suggestions.
- blink: EAR recompute from stored 106-point landmarks.
"""

from facet_tpu.faces.clusterer import FaceClusterer, run_face_clustering


def cli_face_ops(db_path, config, args):
    """Dispatch the CLI's face flags (photos.py)."""
    from facet_tpu.faces.clusterer import (
        extract_faces_from_existing,
        refill_face_thumbnails,
    )

    if args.extract_faces:
        n = extract_faces_from_existing(db_path, config)
        print(f"extracted faces for {n} photos")
    if args.refill_face_thumbnails:
        n = refill_face_thumbnails(db_path, config)
        print(f"refilled {n} face thumbnails")
    if args.cluster_faces or args.cluster_faces_force \
            or getattr(args, "cluster_faces_incremental_named", False):
        stats = run_face_clustering(
            db_path, config, force=args.cluster_faces_force,
            named_only=getattr(args, "cluster_faces_incremental_named",
                               False))
        print(f"clustering: {stats}")
    return 0


__all__ = ["FaceClusterer", "run_face_clustering", "cli_face_ops"]
