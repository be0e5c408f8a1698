"""API configuration: one config parse shared by every router.

(reference: api/config.py:13-110) Resolves the viewer settings, generates a
stable JWT/share secret when none is configured (persisted back so restarts
keep sessions valid), and exposes the multi-user table.
"""

import hashlib
import secrets

from facet_tpu.config.scoring_config import ScoringConfig
from facet_tpu.db.connection import resolve_db_path


class APIConfig:
    def __init__(self, db_path=None, config_path=None, config=None):
        self.db_path = resolve_db_path(db_path)
        self.scoring = config or ScoringConfig(config_path, validate=False)
        self.viewer = self.scoring.get_viewer_settings()
        self.share_secret = self._resolve_secret()

    def _resolve_secret(self):
        secret = self.scoring.config.get("share_secret") or ""
        if not secret:
            secret = secrets.token_hex(32)
            self.scoring.config["share_secret"] = secret
            try:
                self.scoring.save_config()
            except OSError:
                pass  # read-only config: sessions won't survive restarts
        return secret

    # ------------------------------------------------------------ users

    @property
    def viewer_password(self):
        return self.viewer.get("password") or ""

    @property
    def edition_password(self):
        return self.viewer.get("edition_password") or ""

    def get_users(self):
        """{username: {password_hash, role}} from the config's users table."""
        return self.scoring.config.get("users", {})

    @property
    def multi_user(self):
        return bool(self.get_users())

    @staticmethod
    def hash_password(password, salt=""):
        return hashlib.sha256((salt + password).encode()).hexdigest()

    def verify_user(self, username, password):
        """-> role string or None."""
        users = self.get_users()
        record = users.get(username)
        if not record:
            return None
        salt = record.get("salt", "")
        if self.hash_password(password, salt) == record.get("password_hash"):
            return record.get("role", "user")
        return None

    # ------------------------------------------------------------ viewer

    def quality_thresholds(self):
        return self.viewer.get("quality_thresholds",
                               {"good": 6, "great": 7, "excellent": 8, "best": 9})

    def pagination(self):
        return self.viewer.get("pagination",
                               {"default_page_size": 100, "max_page_size": 500})

    def viewer_defaults(self):
        return self.viewer.get("defaults", {})

    def features(self):
        return self.viewer.get("features", {})

    def path_mapping(self):
        return self.viewer.get("path_mapping", {})

    def map_path(self, path):
        """Apply viewer path remapping (e.g. NAS mount differences)."""
        for src, dst in self.path_mapping().items():
            if path.startswith(src):
                return dst + path[len(src):]
        return path
