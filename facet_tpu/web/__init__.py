"""Minimal WSGI web framework (stdlib-only).

The reference serves its API through FastAPI/uvicorn; this package is the
first-party equivalent runtime: a route table with path parameters, JSON
request/response handling, middleware hooks, a threaded production server
(wsgiref is dev-only) and an in-process test client — no third-party web
dependencies.
"""

from facet_tpu.web.framework import App, Request, Response, HTTPError, JSONResponse
from facet_tpu.web.client import TestClient
from facet_tpu.web.server import serve

__all__ = ["App", "Request", "Response", "JSONResponse", "HTTPError",
           "TestClient", "serve"]
