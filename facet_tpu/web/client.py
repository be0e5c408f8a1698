"""In-process WSGI test client (no sockets)."""

import io
import json as jsonlib
from urllib.parse import urlencode


class ClientResponse:
    def __init__(self, status, headers, body):
        self.status_code = int(status.split(" ", 1)[0])
        self.headers = dict(headers)
        self.content = body

    def json(self):
        return jsonlib.loads(self.content)

    @property
    def text(self):
        return self.content.decode()


class TestClient:
    def __init__(self, app):
        self.app = app
        self.default_headers = {}

    def request(self, method, path, params=None, json=None, data=None,
                headers=None):
        if params:
            path = f"{path}?{urlencode(params, doseq=True)}"
        if "?" in path:
            path, _, query = path.partition("?")
        else:
            query = ""
        body = b""
        content_type = None
        if json is not None:
            body = jsonlib.dumps(json).encode()
            content_type = "application/json"
        elif data is not None:
            body = data if isinstance(data, bytes) else data.encode()

        # mimic a PEP 3333 server: percent-decode the path, then present
        # the bytes as latin-1 text (wsgiref does exactly this)
        from urllib.parse import unquote

        environ = {
            "REQUEST_METHOD": method.upper(),
            "PATH_INFO": unquote(path, encoding="latin-1"),
            "QUERY_STRING": query,
            "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body),
        }
        if content_type:
            environ["CONTENT_TYPE"] = content_type
        for key, val in {**self.default_headers, **(headers or {})}.items():
            environ["HTTP_" + key.upper().replace("-", "_")] = val

        captured = {}

        def start_response(status, response_headers):
            captured["status"] = status
            captured["headers"] = response_headers

        chunks = self.app(environ, start_response)
        return ClientResponse(captured["status"], captured["headers"],
                              b"".join(chunks))

    def get(self, path, **kw):
        return self.request("GET", path, **kw)

    def post(self, path, **kw):
        return self.request("POST", path, **kw)

    def put(self, path, **kw):
        return self.request("PUT", path, **kw)

    def delete(self, path, **kw):
        return self.request("DELETE", path, **kw)
