"""Stateless authentication: HS256 JWT + HMAC share tokens (stdlib only).

Four modes, as in the reference (api/auth.py:1-107):
- no password configured  -> everyone is admin;
- viewer password         -> one shared login, role 'admin';
- edition password        -> read-only by default, edit after second login;
- multi-user              -> users table with roles user/admin/superadmin.

Tokens are standard JWTs (base64url header.payload.signature, HS256) with a
48h expiry, implemented directly on hmac/hashlib. Share tokens are HMAC
digests over a person id for public person pages.
"""

import base64
import hashlib
import hmac
import json
import time

from facet_tpu.web.framework import HTTPError

TOKEN_TTL_SECONDS = 48 * 3600

ROLE_ORDER = {"user": 0, "admin": 1, "superadmin": 2}


def _b64url(data):
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64url_decode(text):
    pad = "=" * (-len(text) % 4)
    return base64.urlsafe_b64decode(text + pad)


def encode_jwt(payload, secret):
    header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    body = _b64url(json.dumps(payload).encode())
    signing_input = f"{header}.{body}".encode()
    sig = hmac.new(secret.encode(), signing_input, hashlib.sha256).digest()
    return f"{header}.{body}.{_b64url(sig)}"


def decode_jwt(token, secret):
    """-> payload dict, or None for invalid/expired tokens."""
    try:
        header, body, sig = token.split(".")
        signing_input = f"{header}.{body}".encode()
        expected = hmac.new(secret.encode(), signing_input, hashlib.sha256).digest()
        if not hmac.compare_digest(expected, _b64url_decode(sig)):
            return None
        payload = json.loads(_b64url_decode(body))
        if payload.get("exp", 0) < time.time():
            return None
        return payload
    except Exception:
        return None


def make_share_token(person_id, secret):
    return hmac.new(secret.encode(), f"person:{person_id}".encode(),
                    hashlib.sha256).hexdigest()[:32]


def check_share_token(person_id, token, secret):
    return hmac.compare_digest(make_share_token(person_id, secret), token or "")


class AuthManager:
    def __init__(self, api_config):
        self.config = api_config

    # ------------------------------------------------------------- login

    def login(self, username=None, password=None):
        """-> (user_id, role) or raises HTTPError(401)."""
        cfg = self.config
        if cfg.multi_user:
            role = cfg.verify_user(username or "", password or "")
            if role is None:
                raise HTTPError(401, "invalid credentials")
            return username, role
        supplied = (password or "").encode()
        if cfg.edition_password and hmac.compare_digest(
                supplied, cfg.edition_password.encode()):
            return "editor", "admin"
        if cfg.viewer_password:
            if hmac.compare_digest(supplied, cfg.viewer_password.encode()):
                role = "user" if cfg.edition_password else "admin"
                return "viewer", role
            raise HTTPError(401, "invalid password")
        if cfg.edition_password:
            # edition-only mode: a wrong password must NOT fall through to
            # the open-instance branch (that handed out admin tokens for
            # any password — round-4 review finding)
            raise HTTPError(401, "invalid password")
        return "anonymous", "admin"  # open instance: no gate configured

    def issue_token(self, user_id, role):
        return encode_jwt({"sub": user_id, "role": role,
                           "exp": time.time() + TOKEN_TTL_SECONDS},
                          self.config.share_secret)

    # -------------------------------------------------------- middleware

    def auth_required(self):
        """True when some credential gate is configured."""
        cfg = self.config
        return bool(cfg.multi_user or cfg.viewer_password or cfg.edition_password)

    def current_user(self, request):
        """-> (user_id, role) or (None, None)."""
        header = request.headers.get("authorization", "")
        token = header[7:] if header.lower().startswith("bearer ") else \
            request.query.get("token")
        if token:
            payload = decode_jwt(token, self.config.share_secret)
            if payload:
                return payload.get("sub"), payload.get("role", "user")
        if not self.auth_required():
            return "anonymous", "admin"
        return None, None

    def middleware(self, request):
        """Attach auth state; reject protected paths without credentials."""
        user, role = self.current_user(request)
        request.state["user"] = user
        request.state["role"] = role
        path = request.path
        if path.startswith("/api") and user is None:
            # public endpoints: auth itself, i18n, shared person pages
            if path.startswith(("/api/auth", "/api/i18n", "/api/shared")):
                return None
            raise HTTPError(401, "authentication required")
        return None


def require_role(request, minimum="admin"):
    role = request.state.get("role") or "user"
    if ROLE_ORDER.get(role, 0) < ROLE_ORDER.get(minimum, 1):
        raise HTTPError(403, f"requires {minimum} role")
