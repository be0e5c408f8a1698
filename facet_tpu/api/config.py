"""API configuration: one config parse shared by every router.

(reference: api/config.py:13-110) Resolves the viewer settings, generates a
stable JWT/share secret when none is configured (persisted back so restarts
keep sessions valid), and exposes the multi-user table.
"""

import hashlib
import hmac
import secrets

PBKDF2_ITERATIONS = 100_000

# A share_secret that shipped baked into an early default config (commit
# 303ab93 blanked it, but it survives in git history and any deployment that
# copied the old file). Treat it as publicly known: never sign with it.
_KNOWN_LEAKED_SECRET_SHA256 = (
    "c067ca5efe8dfae464d8dbe403f186d5a0bfde4edb6b989802c770a8814b9b7c"
)


def is_leaked_secret(secret):
    digest = hashlib.sha256((secret or "").encode()).hexdigest()
    return hmac.compare_digest(digest, _KNOWN_LEAKED_SECRET_SHA256)

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
        if secret and is_leaked_secret(secret):
            # This exact value shipped in a published default config: anyone
            # with repo access can forge admin JWTs signed with it. Rotate.
            print("WARNING: configured share_secret matches a publicly leaked "
                  "default; regenerating it (existing sessions/share links "
                  "are invalidated).")
            secret = ""
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
    def hash_password(password, salt=None):
        """PBKDF2-HMAC-SHA256, 100k iterations, 'salt_hex:dk_hex' format.

        Matches the reference scheme (api/config.py) so hashes written by
        either implementation verify in both.
        """
        salt_bytes = bytes.fromhex(salt) if salt else secrets.token_bytes(16)
        dk = hashlib.pbkdf2_hmac("sha256", password.encode(), salt_bytes,
                                 PBKDF2_ITERATIONS)
        return f"{salt_bytes.hex()}:{dk.hex()}"

    @staticmethod
    def check_password(password, stored):
        """Verify against 'salt_hex:dk_hex'; legacy unsalted SHA-256 hex
        digests (no colon) still verify so pre-existing users can log in."""
        if not stored:
            return False
        if ":" in stored:
            salt, _ = stored.split(":", 1)
            try:
                computed = APIConfig.hash_password(password, salt)
            except ValueError:
                return False
            return hmac.compare_digest(computed, stored)
        legacy = hashlib.sha256(password.encode()).hexdigest()
        return hmac.compare_digest(legacy, stored)

    def verify_user(self, username, password):
        """-> role string or None."""
        users = self.get_users()
        record = users.get(username)
        if not record:
            return None
        if self.check_password(password, record.get("password_hash", "")):
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
