#!/usr/bin/env python3
"""facet_tpu CLI — scan photo libraries and maintain the score database.

TPU-native counterpart of the reference CLI (photos.py): same flag
vocabulary, same database contract. Default scan mode is chunked multi-pass;
--single-pass streams through the batch processor; --pass runs one ensemble
member; recompute modes rework stored raw data without touching images.
"""

import argparse
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(
        description="Score photo libraries with the TPU-native ensemble")
    p.add_argument("directory", nargs="?", help="photo directory to scan")
    p.add_argument("--db", default=None, help="database path (default photo_scores_pro.db)")
    p.add_argument("--config", default=None, help="scoring config path")

    scan = p.add_argument_group("scanning")
    scan.add_argument("--single-pass", action="store_true",
                      help="streaming batch mode instead of chunked multi-pass")
    scan.add_argument("--pass", dest="pass_name", default=None,
                      choices=["quality", "tags", "composition", "faces", "embeddings"],
                      help="run a single ensemble pass")
    scan.add_argument("--force", action="store_true", help="rescan already-scored photos")
    scan.add_argument("--limit", type=int, default=None, help="max photos this run")
    scan.add_argument("--dry-run", action="store_true",
                      help="score a sample without writing the database")
    scan.add_argument("--dry-run-count", type=int, default=10,
                      help="photos to score in --dry-run mode (default 10)")
    scan.add_argument("--batch-size", type=int, default=None)
    scan.add_argument("--workers", type=int, default=None)
    scan.add_argument("--speed-tier", choices=["exact", "fast"], default=None,
                      help="override processing.speed_tier for this run: "
                           "'fast' trades bounded accuracy for throughput "
                           "(stride-4 color entropy, TOPIQ at 256px, face "
                           "detection at 448px — docs/SCORING.md)")

    rec = p.add_argument_group("recompute")
    rec.add_argument("--recompute-average", action="store_true",
                     help="re-score all aggregates from stored raw data")
    rec.add_argument("--recompute-tags-vlm", action="store_true",
                     help="re-tag from stored thumbnails with the VLM tagger")
    rec.add_argument("--fix-thumbnail-rotation", action="store_true",
                     help="rotate stored thumbnails per source EXIF orientation")
    rec.add_argument("--recompute-tags", action="store_true",
                     help="re-tag all photos from stored CLIP embeddings")
    rec.add_argument("--recompute-blinks", action="store_true",
                     help="re-run blink detection from stored landmarks")
    rec.add_argument("--recompute-bursts", action="store_true",
                     help="re-run burst grouping only")
    rec.add_argument("--recompute-category", action="store_true",
                     help="re-run category routing + aggregates only")
    rec.add_argument("--score-topiq", action="store_true",
                     help="backfill TOPIQ scores from stored thumbnails")
    rec.add_argument("--rescan-composition", action="store_true",
                     help="re-run SAMP-Net composition from stored thumbnails")

    faces = p.add_argument_group("faces")
    faces.add_argument("--extract-faces", action="store_true",
                       help="extract faces for photos missing face rows")
    faces.add_argument("--cluster-faces", action="store_true",
                       help="incremental person clustering")
    faces.add_argument("--cluster-faces-incremental-named", action="store_true",
                       help="recluster keeping only NAMED persons"
                            " (unnamed auto-clusters are dropped)")
    faces.add_argument("--cluster-faces-force", action="store_true",
                       help="wipe persons and recluster everything")
    faces.add_argument("--refill-face-thumbnails", action="store_true")

    faces.add_argument("--suggest-person-merges", action="store_true",
                       help="print person-merge suggestions (centroid cosine)")
    faces.add_argument("--merge-threshold", type=float, default=0.55,
                       help="cosine threshold for --suggest-person-merges")

    learn = p.add_argument_group("preference learning")
    learn.add_argument("--optimize-weights", action="store_true",
                       help="learn category weights from pairwise votes")
    learn.add_argument("--optimize-category", default=None,
                       help="category to optimize (default: global)")
    learn.add_argument("--use-cv", action="store_true",
                       help="cross-validated optimization")
    learn.add_argument("--comparison-stats", action="store_true",
                       help="print pairwise-comparison statistics + coverage")

    misc = p.add_argument_group("misc")
    misc.add_argument("--detect-duplicates", action="store_true")
    misc.add_argument("--list-models", action="store_true")
    misc.add_argument("--validate-categories", action="store_true")
    misc.add_argument("--export", choices=["csv", "json"], default=None)
    misc.add_argument("--export-path", default=None)
    misc.add_argument("--compute-recommendations", action="store_true",
                      help="analyze scoring health and propose config changes")
    misc.add_argument("--apply", action="store_true",
                      help="apply recommendations (with --compute-recommendations)")
    misc.add_argument("--simulate", action="store_true",
                      help="simulate recommendations (with --compute-recommendations)")
    misc.add_argument("--verbose", "-v", action="store_true",
                      help="detailed statistics (with --compute-recommendations)")
    misc.add_argument("--vacuum", action="store_true", help="vacuum/analyze the database")
    misc.add_argument("--profile", metavar="DIR", default=None,
                      help="capture a jax.profiler trace of the scan into DIR")
    misc.add_argument("--multihost", action="store_true",
                      help="partition work across jax.distributed hosts"
                           " (per-host DB shards; run --merge-shards on the"
                           " primary host after every host finishes)")
    misc.add_argument("--merge-shards", action="store_true",
                      help="fold per-host shard databases into the primary DB")
    return p


# the reference's exact flag spellings, accepted as aliases so migrating
# scripts keep working (reference photos.py:149-170; our parser consolidates
# e.g. --export-csv/--export-json into --export {csv,json}; the cpu/gpu
# split is meaningless on TPU and maps to the single device path)
LEGACY_FLAGS = {
    "--export-csv": ["--export", "csv"],
    "--export-json": ["--export", "json"],
    "--apply-recommendations": ["--compute-recommendations", "--apply"],
    "--recompute-burst": ["--recompute-bursts"],
    "--cluster-faces-incremental": ["--cluster-faces"],
    "--extract-faces-gpu-incremental": ["--extract-faces"],
    "--extract-faces-gpu-force": ["--extract-faces", "--force"],
    "--recompute-composition-cpu": ["--rescan-composition"],
    "--recompute-composition-gpu": ["--rescan-composition"],
    "--refill-face-thumbnails-incremental": ["--refill-face-thumbnails"],
    "--refill-face-thumbnails-force": ["--refill-face-thumbnails", "--force"],
}


def expand_legacy_flags(argv):
    out = []
    for arg in argv:
        out.extend(LEGACY_FLAGS.get(arg, [arg]))
    return out


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    args = build_parser().parse_args(expand_legacy_flags(argv))
    from facet_tpu.config.scoring_config import ScoringConfig
    from facet_tpu.db.connection import resolve_db_path

    db_path = resolve_db_path(args.db)
    config = ScoringConfig(args.config)
    if args.speed_tier:
        # in-memory override only: a one-run flag must not rewrite the
        # on-disk config the way real settings edits do
        config.config.setdefault("processing", {})["speed_tier"] = \
            args.speed_tier
    # idempotent schema creation/migration up front, so DB-only modes
    # (--export, --optimize-weights, ...) work on a fresh database too
    from facet_tpu.db.schema import init_database

    init_database(db_path)

    if args.list_models:
        from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor

        ChunkedMultiPassProcessor.list_available_models()
        return 0

    if args.validate_categories:
        ok, issues = config.validate_categories(verbose=True)
        return 0 if ok else 1

    if args.vacuum:
        from facet_tpu.db.maintenance import vacuum_database

        vacuum_database(db_path)
        return 0

    if args.merge_shards:
        import glob

        from facet_tpu.parallel.multihost import merge_shards

        root, ext = os.path.splitext(db_path)
        shards = sorted(glob.glob(f"{root}.shard*{ext}"))
        if not shards:
            print("no shard databases found")
            return 0
        merged = merge_shards(db_path, shards)
        print(f"merged {merged} photos from {len(shards)} shards")
        return 0

    if args.recompute_average:
        from facet_tpu.processing.scorer import Facet
        from facet_tpu.utils.burst import process_bursts

        scorer = Facet(db_path, config)
        n = scorer.update_all_aggregates(verbose=True)
        process_bursts(db_path, config)
        print(f"recomputed {n} aggregates")
        return 0

    if args.recompute_tags:
        from facet_tpu.processing.scorer import Facet
        from facet_tpu.utils.burst import process_bursts

        scorer = Facet(db_path, config, lightweight=True)
        scorer.retag_from_embeddings(only_untagged=False, verbose=True)
        scorer.update_all_aggregates(rescore_embeddings=False, verbose=True)
        process_bursts(db_path, config)
        return 0

    if args.recompute_bursts:
        from facet_tpu.utils.burst import process_bursts

        leads = process_bursts(db_path, config)
        print(f"burst processing complete: {leads} leads")
        return 0

    if args.recompute_category:
        from facet_tpu.processing.scorer import Facet

        Facet(db_path, config, lightweight=True).recompute_categories()
        return 0

    if args.score_topiq:
        from facet_tpu.processing.scorer import Facet

        Facet(db_path, config).score_topiq_from_thumbnails()
        return 0

    if args.rescan_composition:
        from facet_tpu.processing.scorer import Facet

        Facet(db_path, config).rescan_composition_from_thumbnails()
        return 0

    if args.recompute_blinks:
        from facet_tpu.faces.blink import recompute_blinks

        n = recompute_blinks(db_path, config)
        print(f"re-evaluated blinks for {n} photos")
        return 0

    if args.detect_duplicates:
        from facet_tpu.utils.duplicate import detect_duplicates

        detect_duplicates(db_path, config)
        return 0

    if args.extract_faces or args.cluster_faces or args.cluster_faces_force \
            or args.cluster_faces_incremental_named \
            or args.refill_face_thumbnails:
        from facet_tpu.faces import cli_face_ops

        return cli_face_ops(db_path, config, args)

    if args.compute_recommendations:
        from facet_tpu.config.percentile_normalizer import run_recommendations

        return run_recommendations(db_path, config, apply=args.apply,
                                   simulate=args.simulate,
                                   verbose=args.verbose)

    if args.recompute_tags_vlm:
        from facet_tpu.processing.scorer import Facet

        Facet(db_path, config, multi_pass=True).retag_with_vlm()
        return 0

    if args.fix_thumbnail_rotation:
        from facet_tpu.utils.thumbnails import fix_thumbnail_rotation

        fix_thumbnail_rotation(db_path)
        return 0

    if args.suggest_person_merges:
        from facet_tpu.faces.merge_analyzer import find_merge_suggestions

        suggestions = find_merge_suggestions(db_path, args.merge_threshold)
        if not suggestions:
            print("no merge suggestions above the threshold")
            return 0
        for s in suggestions:
            names = ", ".join(f"{name or '(unnamed)'} #{pid}" for pid, name
                              in zip(s["person_ids"], s["names"]))
            print(f"  similarity {s['avg_similarity']:.3f}"
                  f" (min {s['min_similarity']:.3f}): {names}")
        print(f"{len(suggestions)} suggestion group(s);"
              " merge via the API or viewer")
        return 0

    if args.comparison_stats:
        from facet_tpu.comparison.manager import ComparisonManager

        manager = ComparisonManager(db_path)
        stats = manager.statistics()
        wins = stats.get("by_winner", {})
        print(f"comparisons: {stats.get('comparisons', 0)}"
              f" (a: {wins.get('a', 0)}, b: {wins.get('b', 0)},"
              f" ties: {wins.get('tie', 0)}, skips: {wins.get('skip', 0)})")
        acc = manager.agreement_accuracy()
        if acc is not None:
            print(f"current-weight agreement: {acc:.1%}")
        print(f"coverage: {stats.get('compared_photos', 0)}/"
              f"{stats.get('photos', 0)} photos"
              f" ({stats.get('coverage', 0):.1%})")
        for cat, count in (stats.get("by_category") or {}).items():
            print(f"  {cat}: {count}")
        return 0

    if args.optimize_weights:
        from facet_tpu.optimization.weight_optimizer import WeightOptimizer

        optimizer = WeightOptimizer(db_path, config)
        kwargs = dict(category=args.optimize_category)
        result = (optimizer.optimize_cv(**kwargs) if args.use_cv
                  else optimizer.optimize(**kwargs))
        if result is None:
            print("not enough comparisons to optimize"
                  " (vote in the comparison view first)")
            return 1
        print(f"category: {result['category']}"
              f" | comparisons: {result['comparisons_used']}")
        print(f"agreement: {result['accuracy_before']:.1%}"
              f" -> {result['accuracy_after']:.1%}")
        if "cv_accuracy" in result:
            print(f"cross-validated accuracy: {result['cv_accuracy']:.1%}"
                  f" +- {result['cv_std']:.1%}")
        for key, new in result["new_weights"].items():
            old = result["old_weights"].get(key, 0.0)
            if abs(new - old) >= 0.005:
                print(f"  {key}: {old:.0%} -> {new:.0%}")
        if not result["suggest"]:
            print("no improvement >= 2% — keeping current weights")
        if args.apply and result["suggest"]:
            optimizer.apply_optimized_weights(result)
            print("applied (snapshot saved); run --recompute-average")
        elif args.apply:
            print("not applied (improvement below threshold)")
        return 0

    if args.export:
        from facet_tpu.utils.export import export_photos

        out = export_photos(db_path, args.export, args.export_path)
        print(f"exported to {out}")
        return 0

    # -------- scanning path --------
    if not args.directory:
        build_parser().print_help()
        return 1
    if not os.path.isdir(args.directory):
        print(f"error: {args.directory} is not a directory", file=sys.stderr)
        return 1

    from facet_tpu.processing.scorer import Facet
    from facet_tpu.utils.image_loading import gather_image_files

    if args.multihost:
        from facet_tpu.parallel import multihost

        pid, nprocs = multihost.initialize()
        db_path = multihost.shard_db_path(db_path, pid)
        print(f"multihost: process {pid}/{nprocs}, shard db {db_path}")

    scorer = Facet(db_path, config, multi_pass=not args.single_pass)
    scanning = config.get_scanning_settings()
    files = gather_image_files(args.directory,
                               skip_hidden=scanning.get("skip_hidden_directories", True))
    if args.multihost:
        files = multihost.partition_paths(files)
    if not args.force and not args.dry_run:
        done = scorer.get_already_scanned_set()
        files = [f for f in files if os.path.abspath(f) not in done and f not in done]
    files = [os.path.abspath(f) for f in files]
    if args.limit:
        files = files[: args.limit]
    if not files:
        print("nothing to scan (all photos already scored; --force to rescan)")
        return 0
    print(f"found {len(files)} photos to process")

    if args.dry_run:
        sample = files[: min(args.dry_run_count, len(files))]
        rows, errors = scorer.score_paths(sample)
        print(f"{'file':<40} {'aggregate':<10} {'aesthetic':<10} {'category'}")
        for row in rows:
            aes = f"{row['aesthetic']:.2f}" if row["aesthetic"] is not None else "-"
            print(f"{os.path.basename(row['path'])[:39]:<40} "
                  f"{row['aggregate']:<10.2f} {aes:<10} {row['category']}")
        for path, err in errors.items():
            print(f"{os.path.basename(path)[:39]:<40} ERROR: {err}")
        return 0

    import contextlib

    trace = contextlib.nullcontext()
    if args.profile:
        import jax

        os.makedirs(args.profile, exist_ok=True)
        trace = jax.profiler.trace(args.profile)
        print(f"profiling into {args.profile}")

    with trace:
        if args.pass_name:
            from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor

            proc = ChunkedMultiPassProcessor(scorer)
            proc.run_single_pass(files, args.pass_name)
        elif args.single_pass:
            from facet_tpu.processing.batch_processor import BatchProcessor

            proc = BatchProcessor(scorer, batch_size=args.batch_size,
                                  num_workers=args.workers)
            proc.process_stream(files)
        else:
            from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor

            proc = ChunkedMultiPassProcessor(scorer)
            proc.process_directory(files)

    # post-scan: burst grouping + tag backfill from stored embeddings
    from facet_tpu.utils.burst import process_bursts

    process_bursts(db_path, config)
    try:
        scorer.retag_from_embeddings(only_untagged=True, verbose=True)
    except Exception as exc:
        print(f"tag backfill skipped: {exc}")
    print("scan complete")
    return 0


if __name__ == "__main__":
    # piping into `head` etc. must not traceback
    import signal

    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    sys.exit(main())
