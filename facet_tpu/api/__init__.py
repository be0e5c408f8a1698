"""HTTP API: the JSON surface the gallery client consumes.

create_app() builds the WSGI application with all routers mounted
(reference: api/__init__.py + 11 routers / ~70 endpoints). DB access goes
through a connection pool; viewer settings come from the scoring config;
auth is stateless JWT.
"""

from facet_tpu.api.app import create_app

__all__ = ["create_app"]
