"""Pairwise comparison feedback: pair selection + vote management.

(reference: comparison/pair_selector.py + comparison_manager.py) Users vote
on photo pairs; the optimization package learns weights from the votes.
"""

from facet_tpu.comparison.pair_selector import PairSelector
from facet_tpu.comparison.manager import ComparisonManager

__all__ = ["PairSelector", "ComparisonManager"]
