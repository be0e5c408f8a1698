"""Aggregate scoring: the config-driven weighted combination of all metrics.

`calculate_aggregate` is the scalar reference-parity path (one photo);
`AggregateScorer` is the vectorized device path used to re-score an entire
library at once (--recompute-average).
"""

from facet_tpu.scoring.brain import (
    calculate_aggregate,
    determine_photo_category,
    parse_shutter_speed,
    safe_float,
    scoring_penalties,
)
from facet_tpu.scoring.vectorized import AggregateScorer

__all__ = [
    "calculate_aggregate",
    "determine_photo_category",
    "parse_shutter_speed",
    "safe_float",
    "scoring_penalties",
    "AggregateScorer",
]
