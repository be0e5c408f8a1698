#!/usr/bin/env python3
"""API server launcher (reference: run_api.py).

    python run_api.py [--host 0.0.0.0] [--port 8000] [--db PATH]
                      [--config PATH] [--static client/dist]
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="facet_tpu API server")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--db", default=None)
    parser.add_argument("--config", default=None)
    parser.add_argument("--static", default=None,
                        help="directory with the built SPA to serve")
    parser.add_argument("--production", action="store_true",
                        help="kept for CLI compatibility (threaded server"
                             " is always used)")
    parser.add_argument("--workers", type=int, default=None,
                        help="kept for CLI compatibility")
    args = parser.parse_args()

    from facet_tpu.api import create_app
    from facet_tpu.web import serve

    app = create_app(db_path=args.db, config_path=args.config,
                     static_dir=args.static)
    serve(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
