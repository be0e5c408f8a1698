"""System router: auth, i18n, filter options, scan control, export download.

(reference: api/routers/auth.py, i18n.py, filter_options.py, scan.py)
"""

import os
import subprocess
import sys
import threading
from collections import deque

from facet_tpu.api.auth import require_role
from facet_tpu.i18n import SUPPORTED_LANGUAGES, load_catalog, negotiate_language
from facet_tpu.web.framework import HTTPError, Response

# scan subprocess state (single scan at a time, like the reference)
_scan_state = {"process": None, "log": deque(maxlen=400), "command": None}
_scan_lock = threading.Lock()


def register(app, ctx):
    # ----------------------------------------------------------------- auth

    @app.post("/api/auth/login")
    def login(request):
        body = request.json()
        user, role = ctx.auth.login(body.get("username"), body.get("password"))
        return {"token": ctx.auth.issue_token(user, role),
                "user": user, "role": role}

    @app.get("/api/auth/me")
    def me(request):
        return {"user": request.state.get("user"),
                "role": request.state.get("role"),
                "auth_required": ctx.auth.auth_required(),
                "multi_user": ctx.config.multi_user}

    @app.post("/api/auth/edition/login")
    def edition_login(request):
        """Second-stage login for edit rights in legacy single-user mode
        (reference api/routers/auth.py:71-85)."""
        import hmac as _hmac

        if ctx.config.multi_user:
            raise HTTPError(400, "use /api/auth/login for multi-user auth")
        body = request.json()
        password = (body.get("password") or "").encode()
        edition = (ctx.config.edition_password or "").encode()
        if not edition or not _hmac.compare_digest(password, edition):
            raise HTTPError(401, "invalid password")
        return {"token": ctx.auth.issue_token("editor", "admin"),
                "user": "editor", "role": "admin"}

    @app.get("/api/auth/status")
    def auth_status(request):
        """Authentication status + feature flags for the client
        (reference api/routers/auth.py:88-104)."""
        user = request.state.get("user")
        role = request.state.get("role")
        return {
            "authenticated": user is not None,
            "multi_user": ctx.config.multi_user,
            "edition_enabled": bool(ctx.config.edition_password),
            "edition_authenticated": role in ("admin", "superadmin"),
            "user_id": user,
            "user_role": role,
            "features": ctx.config.features(),
        }

    # ----------------------------------------------------------------- i18n

    @app.get("/api/i18n/languages")
    def languages(request):
        return {"languages": SUPPORTED_LANGUAGES}

    @app.get("/api/i18n/{lang}")
    def catalog(request, lang):
        resolved = negotiate_language(
            param=lang if lang != "auto" else None,
            cookie=None,
            accept_header=request.headers.get("accept-language"))
        return {"language": resolved, "catalog": load_catalog(resolved)}

    # -------------------------------------------------------- filter options

    @app.get("/api/filter_options")
    def filter_options(request):
        with ctx.connection() as conn:
            cameras = [r[0] for r in conn.execute(
                "SELECT DISTINCT camera_model FROM photos"
                " WHERE camera_model IS NOT NULL ORDER BY camera_model")]
            lenses = [r[0] for r in conn.execute(
                "SELECT DISTINCT lens_model FROM photos"
                " WHERE lens_model IS NOT NULL ORDER BY lens_model")]
            categories = [r[0] for r in conn.execute(
                "SELECT DISTINCT category FROM photos"
                " WHERE category IS NOT NULL ORDER BY category")]
            patterns = [r[0] for r in conn.execute(
                "SELECT DISTINCT composition_pattern FROM photos"
                " WHERE composition_pattern IS NOT NULL")]
            tags = [r[0] for r in conn.execute(
                "SELECT tag FROM photo_tags GROUP BY tag"
                " ORDER BY COUNT(*) DESC LIMIT 200")]
            dates = conn.execute(
                "SELECT MIN(date_taken), MAX(date_taken) FROM photos"
                " WHERE date_taken IS NOT NULL").fetchone()
        return {"cameras": cameras, "lenses": lenses, "categories": categories,
                "patterns": patterns, "tags": tags,
                "date_range": {"min": dates[0], "max": dates[1]}}

    # ----------------------------------------------------------------- scan

    @app.post("/api/scan/start")
    def scan_start(request):
        require_role(request, "superadmin" if ctx.config.multi_user else "admin")
        if not ctx.config.features().get("scan", False):
            raise HTTPError(403, "scanning via API is disabled in the config")
        body = request.json()
        directory = body.get("directory")
        allowed = ctx.config.viewer.get("scan_directories", [])
        # an empty allowlist REJECTS everything, like the reference
        # (api/routers/scan.py:68-73) — treating it as allow-any let any
        # admin-role client scan arbitrary filesystem paths into the DB
        if not directory or directory not in allowed:
            raise HTTPError(400, "directory missing or not in scan_directories")
        with _scan_lock:
            if _scan_state["process"] is not None \
                    and _scan_state["process"].poll() is None:
                raise HTTPError(409, "a scan is already running")
            cli = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))), "photos.py")
            cmd = [sys.executable, cli, directory, "--db", ctx.config.db_path]
            if body.get("single_pass"):
                cmd.append("--single-pass")
            proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                    stderr=subprocess.STDOUT, text=True)
            _scan_state.update(process=proc, command=cmd)
            _scan_state["log"].clear()

            def pump():
                for line in proc.stdout:
                    _scan_state["log"].append(line.rstrip())

            threading.Thread(target=pump, daemon=True).start()
        return {"status": "started", "command": cmd}

    @app.get("/api/scan/status")
    def scan_status(request):
        # the log leaks filesystem layout + every scanned path; same gate
        # as scan_start (reference requires superadmin: scan.py:115-118)
        require_role(request, "superadmin" if ctx.config.multi_user
                     else "admin")
        proc = _scan_state["process"]
        if proc is None:
            return {"running": False, "log": []}
        return {"running": proc.poll() is None,
                "returncode": proc.poll(),
                "log": list(_scan_state["log"])[-100:]}

    @app.get("/api/scan/directories")
    def scan_directories(request):
        """List the directories configured as scannable
        (reference: api/routers/scan.py:139 scan_directories)."""
        require_role(request, "superadmin" if ctx.config.multi_user else "admin")
        if not ctx.config.features().get("scan", False):
            raise HTTPError(403, "scanning via API is disabled in the config")
        dirs = ctx.config.viewer.get("scan_directories", [])
        user = request.state.get("user")
        return {"directories": [
            {"path": d, "owner": user or "shared"} for d in dirs]}

    # ------------------------------------------------------------- download

    @app.get("/api/download")
    def download(request):
        if not ctx.config.features().get("download", True):
            raise HTTPError(403, "downloads disabled")
        fmt = request.param("format", "json")
        if fmt not in ("json", "csv"):
            raise HTTPError(400, "format must be json or csv")
        import tempfile

        from facet_tpu.utils.export import export_photos

        with tempfile.NamedTemporaryFile(suffix=f".{fmt}", delete=False) as tmp:
            out_path = export_photos(ctx.config.db_path, fmt, tmp.name)
        try:
            with open(out_path, "rb") as fh:
                data = fh.read()
        finally:
            os.unlink(out_path)
        ctype = "application/json" if fmt == "json" else "text/csv"
        return Response(data, content_type=ctype, headers={
            "Content-Disposition": f'attachment; filename="photo_scores.{fmt}"'})

    # ------------------------------------------------------------- validation

    @app.get("/api/validate")
    def validate(request):
        require_role(request, "admin")
        from facet_tpu.validation.database_validator import DatabaseValidator

        results = DatabaseValidator(ctx.config.db_path).run_all_checks()
        return {"checks": [r.to_dict() for r in results]}
