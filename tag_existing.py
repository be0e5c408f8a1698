#!/usr/bin/env python3
"""Tag photos from stored CLIP embeddings — no image IO, no rescan.

(reference: tag_existing.py) Used standalone and as the post-scan backfill.
"""

import argparse
import sys


def run_tagging(db_path=None, config_path=None, only_untagged=True, verbose=True):
    from facet_tpu.config.scoring_config import ScoringConfig
    from facet_tpu.processing.scorer import Facet

    config = ScoringConfig(config_path)
    scorer = Facet(db_path or "photo_scores_pro.db", config, lightweight=True)
    return scorer.retag_from_embeddings(only_untagged=only_untagged,
                                        verbose=verbose)


def main():
    parser = argparse.ArgumentParser(description="tag photos from stored embeddings")
    parser.add_argument("--db", default=None)
    parser.add_argument("--config", default=None)
    parser.add_argument("--all", action="store_true",
                        help="re-tag every photo, not just untagged ones")
    args = parser.parse_args()
    n = run_tagging(args.db, args.config, only_untagged=not args.all)
    print(f"tagged {n} photos")
    return 0


if __name__ == "__main__":
    sys.exit(main())
