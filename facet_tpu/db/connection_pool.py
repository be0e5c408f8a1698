"""Thread-safe lazy SQLite connection pool.

Mirrors the behavior of the reference pool (db/connection_pool.py:15-161):
connections are created lazily up to a cap, pre-pragma'd, rolled back when
returned, and a process-wide singleton is available for the API server.
"""

import queue
import sqlite3
import threading

from facet_tpu.db.connection import apply_pragmas, resolve_db_path


class ConnectionPool:
    def __init__(self, db_path=None, max_connections=8):
        self.db_path = resolve_db_path(db_path)
        self.max_connections = max_connections
        self._idle = queue.Queue(maxsize=max_connections)
        self._created = 0
        self._lock = threading.Lock()
        self._closed = False

    def _new_connection(self):
        conn = sqlite3.connect(self.db_path, check_same_thread=False)
        conn.row_factory = sqlite3.Row
        apply_pragmas(conn)
        return conn

    def acquire(self, timeout=30.0):
        if self._closed:
            raise RuntimeError("pool is closed")
        try:
            return self._idle.get_nowait()
        except queue.Empty:
            pass
        with self._lock:
            if self._created < self.max_connections:
                self._created += 1
                try:
                    return self._new_connection()
                except Exception:
                    # still holding self._lock (non-reentrant!) — just undo
                    # the count and surface the connect error
                    self._created -= 1
                    raise
        return self._idle.get(timeout=timeout)

    def release(self, conn):
        try:
            conn.rollback()  # drop any uncommitted state before reuse
        except sqlite3.Error:
            try:
                conn.close()
            finally:
                with self._lock:
                    self._created -= 1
            return
        if self._closed:
            conn.close()
            return
        try:
            self._idle.put_nowait(conn)
        except queue.Full:
            conn.close()
            with self._lock:
                self._created -= 1

    class _Lease:
        def __init__(self, pool):
            self.pool = pool
            self.conn = None

        def __enter__(self):
            self.conn = self.pool.acquire()
            return self.conn

        def __exit__(self, exc_type, exc, tb):
            self.pool.release(self.conn)
            return False

    def connection(self):
        """Context manager: ``with pool.connection() as conn: ...``"""
        return ConnectionPool._Lease(self)

    def close(self):
        self._closed = True
        while True:
            try:
                self._idle.get_nowait().close()
            except queue.Empty:
                break


_global_pool = None
_global_lock = threading.Lock()


def get_pool(db_path=None, max_connections=8):
    """Process-wide singleton pool (used by the API server).

    A second caller naming a DIFFERENT database gets an error, not a
    silently wrong pool (round-4 review finding); db_path=None means
    'the existing pool'."""
    global _global_pool
    with _global_lock:
        if _global_pool is None:
            _global_pool = ConnectionPool(db_path, max_connections)
        elif (db_path is not None
              and resolve_db_path(db_path) != _global_pool.db_path):
            raise ValueError(
                f"pool already bound to {_global_pool.db_path!r}; call "
                f"reset_pool() before rebinding to {db_path!r}")
        return _global_pool


def reset_pool():
    """Close and forget the singleton (used by tests)."""
    global _global_pool
    with _global_lock:
        if _global_pool is not None:
            _global_pool.close()
            _global_pool = None
