"""WSGI app factory: wires config, auth, pool and all routers."""

import os

from facet_tpu.api.auth import AuthManager
from facet_tpu.api.config import APIConfig
from facet_tpu.db.connection_pool import ConnectionPool
from facet_tpu.db.schema import init_database
from facet_tpu.web.framework import App, HTTPError, Response


class APIContext:
    """Shared state handed to every router module."""

    def __init__(self, db_path=None, config_path=None, config=None,
                 pool_size=8):
        self.config = APIConfig(db_path, config_path, config)
        init_database(self.config.db_path)
        self.pool = ConnectionPool(self.config.db_path, max_connections=pool_size)
        self.auth = AuthManager(self.config)

    def connection(self):
        return self.pool.connection()


def create_app(db_path=None, config_path=None, config=None, static_dir=None):
    app = App()
    ctx = APIContext(db_path, config_path, config)
    app.ctx = ctx
    app.add_middleware(ctx.auth.middleware)

    from facet_tpu.api.routers import (
        comparison,
        filter_options,
        gallery,
        persons,
        stats,
        system,
        thumbnails,
    )

    for module in (gallery, stats, thumbnails, persons, comparison, system,
                   filter_options):
        module.register(app, ctx)

    if static_dir and os.path.isdir(static_dir):
        _mount_spa(app, static_dir)
    return app


def _mount_spa(app, static_dir):
    """Static SPA fallback with path traversal protection."""
    import mimetypes

    root = os.path.realpath(static_dir)

    def spa(request):
        rel = request.path.lstrip("/") or "index.html"
        full = os.path.realpath(os.path.join(root, rel))
        if not full.startswith(root + os.sep) and full != root:
            raise HTTPError(403, "forbidden")
        if not os.path.isfile(full):
            full = os.path.join(root, "index.html")
            if not os.path.isfile(full):
                raise HTTPError(404, "not found")
        ctype = mimetypes.guess_type(full)[0] or "application/octet-stream"
        with open(full, "rb") as fh:
            return Response(fh.read(), content_type=ctype)

    app.not_found_handler = spa
