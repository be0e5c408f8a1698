"""WSGI application core: routing, requests, responses.

Routes register with decorators and support typed path parameters:

    app = App()

    @app.get("/api/photos")
    def photos(request): ...

    @app.get("/api/persons/{person_id:int}")
    def person(request, person_id): ...

Handlers return a Response, a dict/list (JSON), bytes, or str. Raise
HTTPError(status, detail) for error responses. Middleware are callables
(request) -> None or Response (short-circuit), run in registration order.
"""

import json
import re
import traceback
from http import HTTPStatus


def _status_phrase(code):
    """Reason phrase for a status code; non-standard codes (499, 599, ...)
    must not crash response serialization (HTTPStatus raises ValueError)."""
    try:
        return HTTPStatus(code).phrase
    except ValueError:
        return "Unknown"
from urllib.parse import parse_qs


class HTTPError(Exception):
    def __init__(self, status, detail=""):
        super().__init__(detail)
        self.status = status
        self.detail = detail


class Request:
    def __init__(self, environ):
        self.environ = environ
        self.method = environ.get("REQUEST_METHOD", "GET").upper()
        # PEP 3333: servers percent-decode PATH_INFO and hand it over as
        # latin-1 text; re-decode as UTF-8 so non-ASCII photo paths match
        # their database rows
        raw_path = environ.get("PATH_INFO", "/")
        try:
            self.path = raw_path.encode("latin-1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            self.path = raw_path
        self.query_all = parse_qs(environ.get("QUERY_STRING", ""))
        self.query = {k: v[-1] for k, v in self.query_all.items()}
        self.headers = {
            k[5:].replace("_", "-").lower(): v
            for k, v in environ.items() if k.startswith("HTTP_")
        }
        if environ.get("CONTENT_TYPE"):
            self.headers["content-type"] = environ["CONTENT_TYPE"]
        self._body = None
        self.state = {}  # middleware scratch (e.g. authenticated user)

    @property
    def body(self):
        if self._body is None:
            try:
                length = int(self.environ.get("CONTENT_LENGTH") or 0)
            except ValueError:
                length = 0
            self._body = self.environ["wsgi.input"].read(length) if length else b""
        return self._body

    def json(self):
        if not self.body:
            return {}
        try:
            return json.loads(self.body)
        except ValueError:
            raise HTTPError(400, "invalid JSON body")

    def param(self, name, default=None, type=str):
        raw = self.query.get(name)
        if raw is None or raw == "":
            return default
        try:
            if type is bool:
                return raw.lower() in ("1", "true", "yes", "on")
            return type(raw)
        except (TypeError, ValueError):
            raise HTTPError(400, f"invalid value for parameter '{name}'")


class Response:
    def __init__(self, body=b"", status=200, content_type="text/plain; charset=utf-8",
                 headers=None):
        self.body = body.encode() if isinstance(body, str) else body
        self.status = status
        self.headers = dict(headers or {})
        self.headers.setdefault("Content-Type", content_type)


class JSONResponse(Response):
    def __init__(self, data, status=200, headers=None):
        super().__init__(json.dumps(data, default=str), status,
                         "application/json", headers)


_PARAM_RE = re.compile(r"{(\w+)(?::(int|float|path))?}")
_CONVERTERS = {"int": int, "float": float, "path": str, None: str}


def _compile(pattern):
    regex, converters = "", {}
    pos = 0
    for match in _PARAM_RE.finditer(pattern):
        regex += re.escape(pattern[pos:match.start()])
        name, kind = match.group(1), match.group(2)
        part = r"[^/]+" if kind != "path" else r".+"
        regex += f"(?P<{name}>{part})"
        converters[name] = _CONVERTERS[kind]
        pos = match.end()
    regex += re.escape(pattern[pos:])
    return re.compile(f"^{regex}$"), converters


class App:
    def __init__(self):
        self.routes = []       # (method, regex, converters, handler)
        self.middleware = []
        self.not_found_handler = None

    # ------------------------------------------------------------ registry

    def route(self, pattern, methods=("GET",)):
        regex, converters = _compile(pattern)

        def register(handler):
            for method in methods:
                self.routes.append((method.upper(), regex, converters, handler))
            return handler

        return register

    def get(self, pattern):
        return self.route(pattern, ("GET",))

    def post(self, pattern):
        return self.route(pattern, ("POST",))

    def put(self, pattern):
        return self.route(pattern, ("PUT",))

    def delete(self, pattern):
        return self.route(pattern, ("DELETE",))

    def add_middleware(self, fn):
        self.middleware.append(fn)

    # ------------------------------------------------------------ dispatch

    def _dispatch(self, request):
        for fn in self.middleware:
            early = fn(request)
            if early is not None:
                return early

        allowed = set()
        wanted = "GET" if request.method == "HEAD" else request.method
        for method, regex, converters, handler in self.routes:
            match = regex.match(request.path)
            if not match:
                continue
            if method != wanted:
                allowed.add(method)
                continue
            kwargs = {}
            for name, raw in match.groupdict().items():
                try:
                    kwargs[name] = converters[name](raw)
                except ValueError:
                    raise HTTPError(400, f"invalid path parameter '{name}'")
            return handler(request, **kwargs)
        if allowed:
            raise HTTPError(405, f"method not allowed (try {sorted(allowed)})")
        if self.not_found_handler is not None:
            return self.not_found_handler(request)
        raise HTTPError(404, "not found")

    @staticmethod
    def _coerce(result):
        if isinstance(result, Response):
            return result
        if isinstance(result, (dict, list)):
            return JSONResponse(result)
        if isinstance(result, bytes):
            return Response(result, content_type="application/octet-stream")
        if isinstance(result, str):
            return Response(result)
        if result is None:
            return Response(b"", status=204)
        return JSONResponse(result)

    def __call__(self, environ, start_response):
        request = Request(environ)
        try:
            response = self._coerce(self._dispatch(request))
        except HTTPError as exc:
            response = JSONResponse({"detail": exc.detail or
                                     _status_phrase(exc.status)},
                                    status=exc.status)
        except Exception:
            traceback.print_exc()
            response = JSONResponse({"detail": "internal server error"}, status=500)

        status_line = f"{response.status} {_status_phrase(response.status)}"
        body = response.body
        headers = dict(response.headers)
        headers.setdefault("Content-Length", str(len(body)))
        start_response(status_line, list(headers.items()))
        return [b"" if request.method == "HEAD" else body]
