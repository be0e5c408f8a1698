"""WSGI micro-framework unit tests."""

import pytest

from facet_tpu.web import App, HTTPError, JSONResponse, Response, TestClient


@pytest.fixture
def app():
    app = App()

    @app.get("/items/{item_id:int}")
    def get_item(request, item_id):
        return {"id": item_id}

    @app.get("/files/{name:path}")
    def get_file(request, name):
        return {"name": name}

    @app.post("/items")
    def create_item(request):
        body = request.json()
        if "name" not in body:
            raise HTTPError(422, "name required")
        return JSONResponse({"created": body["name"]}, status=201)

    @app.get("/query")
    def query(request):
        return {"n": request.param("n", 0, int),
                "flag": request.param("flag", False, bool)}

    @app.get("/boom")
    def boom(request):
        raise ValueError("unexpected")

    return app


@pytest.fixture
def client(app):
    return TestClient(app)


def test_path_params(client):
    assert client.get("/items/42").json() == {"id": 42}
    assert client.get("/items/notanint").status_code == 400
    assert client.get("/files/a/b/c.jpg").json() == {"name": "a/b/c.jpg"}


def test_method_routing(client):
    res = client.post("/items", json={"name": "x"})
    assert res.status_code == 201 and res.json() == {"created": "x"}
    assert client.post("/items", json={}).status_code == 422
    assert client.delete("/items/1").status_code == 405
    assert client.get("/nope").status_code == 404


def test_head_maps_to_get(client):
    res = client.request("HEAD", "/items/7")
    assert res.status_code == 200
    assert res.content == b""
    assert int(res.headers["Content-Length"]) > 0


def test_query_params(client):
    assert client.get("/query", params={"n": 5, "flag": "true"}).json() == \
        {"n": 5, "flag": True}
    assert client.get("/query", params={"n": "bad"}).status_code == 400


def test_internal_error_wrapped(client):
    res = client.get("/boom")
    assert res.status_code == 500
    assert res.json()["detail"] == "internal server error"


def test_invalid_json_body(client):
    res = client.request("POST", "/items", data=b"{broken")
    assert res.status_code == 400


def test_middleware_short_circuit(app):
    app.add_middleware(lambda req: Response("blocked", status=418)
                       if req.path == "/items/1" else None)
    client = TestClient(app)
    assert client.get("/items/1").status_code == 418
    assert client.get("/items/2").status_code == 200


def test_live_server_roundtrip(app):
    """Boot the threaded server on a real socket once."""
    import json
    import threading
    import urllib.request

    from facet_tpu.web.server import ThreadingWSGIServer, QuietHandler

    server = ThreadingWSGIServer(("127.0.0.1", 0), QuietHandler)
    server.set_app(app)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/items/9",
                                    timeout=5) as res:
            assert json.loads(res.read()) == {"id": 9}
    finally:
        server.shutdown()
        server.server_close()


def test_nonstandard_status_codes_serialize():
    """HTTPStatus has no 499/599 — response serialization must not crash
    on codes outside the IANA registry (round-4 review finding)."""
    app = App()

    @app.get("/closed")
    def closed(request):
        raise HTTPError(499, "client closed request")

    @app.get("/odd")
    def odd(request):
        return Response(b"x", status=599)

    client = TestClient(app)
    r = client.get("/closed")
    assert r.status_code == 499
    assert r.json() == {"detail": "client closed request"}
    assert client.get("/odd").status_code == 599
