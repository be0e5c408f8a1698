#!/usr/bin/env python3
"""Database validation CLI (reference: validate_db.py).

    python validate_db.py [--db PATH] [--auto-fix | --report-only]
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser(description="validate the photo database")
    parser.add_argument("--db", default=None)
    parser.add_argument("--auto-fix", action="store_true",
                        help="apply SQL fixes for fixable issues")
    parser.add_argument("--report-only", action="store_true",
                        help="just report (default)")
    args = parser.parse_args()

    from facet_tpu.db.connection import resolve_db_path
    from facet_tpu.validation.database_validator import DatabaseValidator

    db_path = resolve_db_path(args.db)
    print(f"validating {db_path}")
    validator = DatabaseValidator(db_path)
    results = validator.run_all_checks(auto_fix=args.auto_fix and not args.report_only,
                                       verbose=True)
    failed = [r for r in results if not r.passed]
    print(f"{len(results) - len(failed)}/{len(results)} checks passed")
    return 1 if failed else 0


if __name__ == "__main__":
    # piping into `head` etc. must not traceback
    import signal

    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    sys.exit(main())
