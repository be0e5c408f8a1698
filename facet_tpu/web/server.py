"""Threaded WSGI server (stdlib): the run_api.py production entry.

Two serving modes, mirroring the reference's uvicorn launcher
(run_api.py:23-49 there):

- default: one process, thread-per-connection (ThreadingMixIn);
- ``workers=N`` (the reference's ``--production --workers N``): N
  pre-forked processes each accepting on the same port via SO_REUSEPORT,
  so the kernel load-balances connections across them. SQLite reads scale
  across processes under WAL (each worker owns its own connection pool);
  writes serialize on the database lock exactly as in the reference's
  multi-worker deployment. The parent supervises: a worker that dies is
  restarted, SIGTERM/SIGINT fans out and reaps.

On platforms without SO_REUSEPORT (or with workers<=1) serving falls back
to the single threaded process.
"""

import os
import signal
import socket
import socketserver
import sys
import time
from wsgiref.simple_server import WSGIRequestHandler, WSGIServer


class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
    daemon_threads = True
    allow_reuse_address = True


class _ReusePortWSGIServer(ThreadingWSGIServer):
    """Binds with SO_REUSEPORT so N worker processes share one port."""

    def server_bind(self):
        self.socket.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
        super().server_bind()


class QuietHandler(WSGIRequestHandler):
    def log_message(self, fmt, *args):  # keep stdout for the app's own logs
        pass


def _serve_one(app, host, port, server_cls, verbose):
    server = server_cls((host, port), QuietHandler)
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


def serve(app, host="0.0.0.0", port=8000, verbose=True, workers=None,
          app_factory=None, max_restarts=100):
    """Serve ``app``; with workers>1 pre-fork that many SO_REUSEPORT
    processes (``app_factory`` rebuilds the app per worker so each owns
    its own connection pool; falls back to sharing ``app`` when omitted).
    """
    if not workers or workers <= 1 or not hasattr(socket, "SO_REUSEPORT"):
        return _serve_one(app, host, port, ThreadingWSGIServer, verbose)

    if verbose:
        print(f"serving on http://{host}:{port} with {workers} workers")
    children = {}

    def spawn(idx):
        pid = os.fork()
        if pid == 0:
            # worker: fresh app (own sqlite pool) + quiet shutdown on TERM
            signal.signal(signal.SIGTERM, lambda *_: sys.exit(0))
            signal.signal(signal.SIGINT, signal.SIG_IGN)
            worker_app = app_factory() if app_factory is not None else app
            try:
                _serve_one(worker_app, host, port, _ReusePortWSGIServer,
                           verbose=False)
            finally:
                os._exit(0)
        children[pid] = idx

    for i in range(workers):
        spawn(i)

    stopping = []

    def _stop(*_):
        stopping.append(True)
        for pid in list(children):
            try:
                os.kill(pid, signal.SIGTERM)
            except ProcessLookupError:
                pass

    signal.signal(signal.SIGTERM, _stop)
    prev_int = signal.signal(signal.SIGINT, _stop)
    restarts = 0
    try:
        while children:
            pid, _status = os.wait()
            idx = children.pop(pid, None)
            if not stopping and idx is not None:
                restarts += 1
                if restarts > max_restarts:
                    print("worker restart limit reached; shutting down",
                          file=sys.stderr)
                    _stop()
                    continue
                time.sleep(0.2)   # crash-loop damping
                spawn(idx)
    except KeyboardInterrupt:
        _stop()
        while children:
            try:
                pid, _ = os.wait()
                children.pop(pid, None)
            except ChildProcessError:
                break
    finally:
        signal.signal(signal.SIGINT, prev_int)
    return None
