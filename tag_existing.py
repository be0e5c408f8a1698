#!/usr/bin/env python3
"""Tag photos from stored CLIP embeddings — no image IO, no rescan.

(reference: tag_existing.py) Used standalone and as the post-scan backfill.
"""

import argparse
import sys


def run_tagging(db_path=None, config_path=None, only_untagged=True,
                verbose=True, dry_run=False, max_tags=None, threshold=None):
    from facet_tpu.config.scoring_config import ScoringConfig
    from facet_tpu.db.connection import get_connection, resolve_db_path
    from facet_tpu.processing.scorer import Facet

    config = ScoringConfig(config_path)
    db_path = db_path or resolve_db_path(None)
    if dry_run:
        where = "clip_embedding IS NOT NULL"
        if only_untagged:
            where += " AND (tags IS NULL OR tags = '')"
        with get_connection(db_path) as conn:
            n = conn.execute(
                f"SELECT COUNT(*) FROM photos WHERE {where}").fetchone()[0]
        if verbose:
            print(f"dry run: {n} photos would be tagged")
        return n
    scorer = Facet(db_path, config, lightweight=True)
    if max_tags is not None:
        scorer.tagger.max_tags = max_tags
    if threshold is not None:
        scorer.tagger.threshold = threshold
    return scorer.retag_from_embeddings(only_untagged=only_untagged,
                                        verbose=verbose)


def main(argv=None):
    parser = argparse.ArgumentParser(description="tag photos from stored embeddings")
    parser.add_argument("--db", default=None)
    parser.add_argument("--config", default=None)
    parser.add_argument("--all", "--force", dest="all", action="store_true",
                        help="re-tag every photo, not just untagged ones"
                             " (--force is the reference's spelling)")
    parser.add_argument("--dry-run", action="store_true",
                        help="count the photos that would be tagged")
    parser.add_argument("--max-tags", type=int, default=None,
                        help="override tagging.max_tags for this run")
    parser.add_argument("--threshold", type=float, default=None,
                        help="override the similarity threshold (0..1)")
    args = parser.parse_args(argv)
    n = run_tagging(args.db, args.config, only_untagged=not args.all,
                    dry_run=args.dry_run, max_tags=args.max_tags,
                    threshold=args.threshold)
    if not args.dry_run:
        print(f"tagged {n} photos")
    return 0


if __name__ == "__main__":
    # piping into `head` etc. must not traceback
    import signal

    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    sys.exit(main())
