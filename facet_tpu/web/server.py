"""Threaded WSGI server (stdlib): the run_api.py production entry."""

import socketserver
from wsgiref.simple_server import WSGIRequestHandler, WSGIServer


class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
    daemon_threads = True
    allow_reuse_address = True


class QuietHandler(WSGIRequestHandler):
    def log_message(self, fmt, *args):  # keep stdout for the app's own logs
        pass


def serve(app, host="0.0.0.0", port=8000, verbose=True):
    server = ThreadingWSGIServer((host, port), QuietHandler)
    server.set_app(app)
    if verbose:
        print(f"serving on http://{host}:{port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return server
