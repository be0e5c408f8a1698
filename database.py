#!/usr/bin/env python3
"""Multi-user administration CLI (reference: database.py).

    python database.py add-user NAME [--role user|admin|superadmin]
    python database.py remove-user NAME
    python database.py list-users
    python database.py migrate-preferences --from-user NAME
"""

import argparse
import getpass
import sys


def main():
    parser = argparse.ArgumentParser(description="user administration")
    parser.add_argument("command",
                        choices=["add-user", "remove-user", "list-users",
                                 "migrate-preferences"])
    parser.add_argument("username", nargs="?")
    parser.add_argument("--role", default="user",
                        choices=["user", "admin", "superadmin"])
    parser.add_argument("--password", default=None,
                        help="password (prompted when omitted)")
    parser.add_argument("--config", default=None)
    parser.add_argument("--db", default=None)
    parser.add_argument("--from-user", default=None,
                        help="source user for preference migration")
    args = parser.parse_args()

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


if __name__ == "__main__":
    sys.exit(main())
