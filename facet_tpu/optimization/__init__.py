"""Weight learning from pairwise preferences.

(reference: optimization/weight_optimizer.py) Bradley-Terry / Davidson
preference model over the 16 metric components, optimized on device with a
projected-gradient trainer (simplex constraint, per-weight cap).
"""

from facet_tpu.optimization.weight_optimizer import WeightOptimizer

__all__ = ["WeightOptimizer"]
