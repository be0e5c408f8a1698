#!/usr/bin/env python3
"""Multi-user administration + database maintenance CLI
(reference: database.py).

    python database.py add-user NAME [--role user|admin|superadmin]
                                     [--display-name "Full Name"]
    python database.py remove-user NAME
    python database.py list-users
    python database.py migrate-preferences --from-user NAME
    python database.py --info | --optimize | --vacuum | --analyze
    python database.py --refresh-stats | --stats-info
    python database.py --export-viewer-db OUT.db
    python database.py --cleanup-orphaned-persons | --migrate-tags
"""

import argparse
import getpass
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="user administration + database maintenance"
                    " (reference: database.py)")
    parser.add_argument("command", nargs="?",
                        choices=["add-user", "remove-user", "list-users",
                                 "migrate-preferences"])
    parser.add_argument("username", nargs="?")
    parser.add_argument("--role", default="user",
                        choices=["user", "admin", "superadmin"])
    parser.add_argument("--password", default=None,
                        help="password (prompted when omitted)")
    parser.add_argument("--display-name", default=None,
                        help="display name for add-user")
    parser.add_argument("--config", default=None)
    parser.add_argument("--db", default=None)
    parser.add_argument("--from-user", default=None,
                        help="source user for preference migration")
    # maintenance flags (the reference's spellings)
    maint = parser.add_argument_group("maintenance")
    maint.add_argument("--info", action="store_true",
                       help="table sizes + database overview")
    maint.add_argument("--vacuum", action="store_true")
    maint.add_argument("--analyze", action="store_true")
    maint.add_argument("--optimize", action="store_true",
                       help="vacuum + analyze")
    maint.add_argument("--refresh-stats", action="store_true",
                       help="rebuild the stats cache")
    maint.add_argument("--stats-info", action="store_true",
                       help="show the cached stats keys + freshness")
    maint.add_argument("--export-viewer-db", metavar="OUT", default=None,
                       help="write a thumbnails-only copy for remote viewing")
    maint.add_argument("--cleanup-orphaned-persons", action="store_true")
    maint.add_argument("--migrate-tags", action="store_true",
                       help="populate photo_tags from the photos.tags column")
    args = parser.parse_args(argv)

    rc = _run_maintenance(args)
    if args.command is None:
        if rc is not None:
            return rc
        parser.print_usage()
        return 1

    from facet_tpu.api.config import APIConfig
    from facet_tpu.config.scoring_config import ScoringConfig

    config = ScoringConfig(args.config, validate=False)

    if args.command == "list-users":
        users = config.config.get("users", {})
        if not users:
            print("no users configured (single-user mode)")
        for name, record in users.items():
            print(f"  {name}: {record.get('role', 'user')}")
        return 0

    if args.command == "add-user":
        if not args.username:
            print("username required", file=sys.stderr)
            return 1
        password = args.password or getpass.getpass(f"password for {args.username}: ")
        users = config.config.setdefault("users", {})
        users[args.username] = {
            "password_hash": APIConfig.hash_password(password),
            "role": args.role,
        }
        if args.display_name:
            users[args.username]["display_name"] = args.display_name
        config.save_config()
        print(f"user '{args.username}' added with role {args.role}")
        return 0

    if args.command == "remove-user":
        users = config.config.get("users", {})
        if args.username not in users:
            print(f"no such user: {args.username}", file=sys.stderr)
            return 1
        del users[args.username]
        config.save_config()
        print(f"user '{args.username}' removed")
        return 0

    if args.command == "migrate-preferences":
        # legacy single-user ratings -> per-user rows for --from-user
        if not args.from_user:
            print("--from-user required", file=sys.stderr)
            return 1
        from facet_tpu.db.connection import get_connection, resolve_db_path

        db_path = resolve_db_path(args.db)
        with get_connection(db_path) as conn:
            rows = conn.execute(
                "SELECT path, star_rating, is_favorite, is_rejected FROM photos"
                " WHERE star_rating > 0 OR is_favorite = 1 OR is_rejected = 1"
            ).fetchall()
            for path, rating, fav, rej in rows:
                conn.execute(
                    "INSERT OR REPLACE INTO user_preferences"
                    " (user_id, photo_path, star_rating, is_favorite, is_rejected)"
                    " VALUES (?, ?, ?, ?, ?)",
                    (args.from_user, path, rating or 0, fav or 0, rej or 0))
        print(f"migrated preferences for {len(rows)} photos to {args.from_user}")
        return 0


def _run_maintenance(args):
    """Run any maintenance flags; None when none were given."""
    from facet_tpu.db.connection import get_connection, resolve_db_path
    from facet_tpu.db.schema import init_database

    wanted = any((args.info, args.vacuum, args.analyze, args.optimize,
                  args.refresh_stats, args.stats_info,
                  args.export_viewer_db, args.cleanup_orphaned_persons,
                  args.migrate_tags))
    if not wanted:
        return None
    db_path = resolve_db_path(args.db)
    init_database(db_path)      # idempotent: fresh databases work too
    ran = None
    if args.info:
        with get_connection(db_path) as conn:
            print(f"database: {db_path}")
            for (name,) in conn.execute(
                    "SELECT name FROM sqlite_master WHERE type='table'"
                    " ORDER BY name"):
                n = conn.execute(f"SELECT COUNT(*) FROM {name}").fetchone()[0]
                print(f"  {name}: {n} rows")
        ran = 0
    if args.vacuum or args.optimize:
        from facet_tpu.db.maintenance import vacuum_database

        vacuum_database(db_path)
        ran = 0
    if args.analyze or args.optimize:
        with get_connection(db_path) as conn:
            conn.execute("ANALYZE")
        print("analyzed")
        ran = 0
    if args.refresh_stats:
        from facet_tpu.db.stats_cache import refresh_stats_cache

        refresh_stats_cache(db_path, verbose=True)
        ran = 0
    if args.stats_info:
        with get_connection(db_path) as conn:
            rows = conn.execute(
                "SELECT key, updated_at FROM stats_cache ORDER BY key"
            ).fetchall()
        import datetime

        for key, ts in rows:
            when = datetime.datetime.fromtimestamp(ts).isoformat(" ", "seconds") \
                if ts else "never"
            print(f"  {key}: updated {when}")
        if not rows:
            print("stats cache empty (run --refresh-stats)")
        ran = 0
    if args.export_viewer_db:
        from facet_tpu.db.maintenance import export_viewer_db

        export_viewer_db(db_path, args.export_viewer_db)
        ran = 0
    if args.cleanup_orphaned_persons:
        from facet_tpu.db.maintenance import cleanup_orphaned_persons

        cleanup_orphaned_persons(db_path)
        ran = 0
    if args.migrate_tags:
        from facet_tpu.db.tags import migrate_tags_to_lookup

        migrate_tags_to_lookup(db_path)
        ran = 0
    return ran


if __name__ == "__main__":
    # piping into `head` etc. must not traceback
    import signal

    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    sys.exit(main())
