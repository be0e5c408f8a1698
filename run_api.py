#!/usr/bin/env python3
"""API server launcher (reference: run_api.py).

    python run_api.py [--host 0.0.0.0] [--port 8000] [--db PATH]
                      [--config PATH] [--static client/dist]
"""

import argparse
import os


def resolve_static(arg):
    """--static wins; otherwise the bundled client/ serves when present
    (the reference auto-mounts client/dist the same way, api/__init__.py:87)."""
    if arg is not None:
        return arg
    bundled = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "client")
    if os.path.isfile(os.path.join(bundled, "index.html")):
        return bundled
    return None


def main():
    parser = argparse.ArgumentParser(description="facet_tpu API server")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--db", default=None)
    parser.add_argument("--config", default=None)
    parser.add_argument("--static", default=None,
                        help="directory with the SPA to serve (defaults to"
                             " the bundled client/ when it exists, mirroring"
                             " the reference's client/dist auto-mount,"
                             " api/__init__.py:87)")
    parser.add_argument("--production", action="store_true",
                        help="pre-fork --workers processes (reference:"
                             " uvicorn --workers, run_api.py:23-49 there)")
    parser.add_argument("--workers", type=int, default=None,
                        help="worker process count for --production"
                             " (SO_REUSEPORT pre-fork; each worker owns its"
                             " own sqlite pool)")
    args = parser.parse_args()

    from facet_tpu.api import create_app
    from facet_tpu.web import serve

    static = resolve_static(args.static)

    def factory():
        return create_app(db_path=args.db, config_path=args.config,
                          static_dir=static)

    workers = args.workers if args.production else None
    serve(factory(), host=args.host, port=args.port, workers=workers,
          app_factory=factory)


if __name__ == "__main__":
    main()
