"""Database validation: post-hoc invariant checks over a scored library."""

from facet_tpu.validation.database_validator import DatabaseValidator, CheckResult

__all__ = ["DatabaseValidator", "CheckResult"]
