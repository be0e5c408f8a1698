"""Pre-fork worker mode of the stdlib WSGI server (web/server.py).

The reference's production launcher spawns N uvicorn workers
(run_api.py:23-49 there); ours pre-forks N SO_REUSEPORT processes. These
tests drive the real thing: a parent process serving a PID-echo app with
workers=2, exercised over real sockets — load spreading across distinct
worker PIDs, supervisor restart of a killed worker, and clean SIGTERM
fan-out.
"""

import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import os, sys
sys.path.insert(0, {repo!r})
from facet_tpu.web.server import serve

def app(environ, start_response):
    start_response("200 OK", [("Content-Type", "text/plain")])
    return [str(os.getpid()).encode()]

serve(app, host="127.0.0.1", port={port}, verbose=True, workers=2)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _get_pid(port, timeout=10):
    deadline = time.time() + timeout
    while True:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=2) as resp:
                return int(resp.read())
        except Exception:
            if time.time() > deadline:
                raise
            time.sleep(0.2)


@pytest.fixture
def server():
    if not hasattr(socket, "SO_REUSEPORT"):
        pytest.skip("no SO_REUSEPORT on this platform")
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-c", SCRIPT.format(repo=REPO, port=port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        yield proc, port
    finally:
        if proc.poll() is None:
            proc.terminate()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()


def test_requests_spread_across_worker_pids(server):
    proc, port = server
    pids = {_get_pid(port) for _ in range(30)}
    assert len(pids) >= 2, pids           # kernel balanced across workers
    assert proc.pid not in pids           # parent only supervises


def test_killed_worker_is_restarted(server):
    proc, port = server
    victim = _get_pid(port)
    os.kill(victim, signal.SIGKILL)
    deadline = time.time() + 15
    seen = set()
    while time.time() < deadline:
        seen.add(_get_pid(port))
        if any(p != victim for p in seen):
            break
        time.sleep(0.2)
    assert any(p != victim for p in seen)
    # and the replacement pool still serves (victim's socket is gone)
    assert _get_pid(port) > 0


def test_sigterm_fans_out_and_exits(server):
    proc, port = server
    workers = {_get_pid(port) for _ in range(20)}
    proc.terminate()
    proc.wait(timeout=15)
    time.sleep(0.5)
    for pid in workers:
        with pytest.raises(ProcessLookupError):
            os.kill(pid, 0)
