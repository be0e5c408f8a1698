"""Scoring configuration: v4.0 category-centric format.

A single JSON file drives everything: 30 content categories in priority order
(each with declarative filters, 12 metric weights, modifiers and tag
vocabularies), plus thresholds, penalties, processing envelopes, model
profiles and viewer settings (reference: config/scoring_config.py,
scoring_config.json).
"""

from facet_tpu.config.category_filter import (
    CategoryFilter,
    VALID_NUMERIC_FILTERS,
    VALID_BOOLEAN_FILTERS,
    VALID_TAG_FILTERS,
    VALID_WEIGHT_COLUMNS,
)
from facet_tpu.config.scoring_config import ScoringConfig
from facet_tpu.config.default_config import build_default_config, write_default_config

__all__ = [
    "CategoryFilter",
    "ScoringConfig",
    "build_default_config",
    "write_default_config",
    "VALID_NUMERIC_FILTERS",
    "VALID_BOOLEAN_FILTERS",
    "VALID_TAG_FILTERS",
    "VALID_WEIGHT_COLUMNS",
]
