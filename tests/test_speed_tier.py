"""The fast speed tier (processing.speed_tier) — plumbing tests.

docs/SCORING.md documents the divergences; these tests pin that the knob
actually reaches each member: stride-4 entropy in the fused scorer,
TOPIQ at 256px, SCRFD at 448px — and that exact mode (and unknown
values) leave everything at reference-parity settings.
"""

import json

from facet_tpu.config import ScoringConfig


def _config(tmp_path, tier=None):
    path = tmp_path / f"scoring_config_{tier or 'default'}.json"
    cfg = ScoringConfig(str(path))
    if tier is not None:
        cfg.config.setdefault("processing", {})["speed_tier"] = tier
        cfg.save_config()
        cfg = ScoringConfig(str(path))
    return cfg


def test_default_tier_is_exact(tmp_path):
    assert _config(tmp_path).speed_tier() == "exact"


def test_unknown_tier_falls_back_to_exact(tmp_path):
    assert _config(tmp_path, "turbo").speed_tier() == "exact"


def test_fast_tier_parses(tmp_path):
    assert _config(tmp_path, "fast").speed_tier() == "fast"
    assert _config(tmp_path, "FAST").speed_tier() == "fast"


def test_topiq_eval_size_follows_tier(tmp_path):
    from facet_tpu.models.topiq import (FAST_TIER_INPUT_SIZE, TOPIQConfig,
                                        TOPIQScorer)

    exact = TOPIQScorer.create(_config(tmp_path))
    assert exact.config.input_size == TOPIQConfig().input_size == 384
    fast = TOPIQScorer.create(_config(tmp_path, "fast"))
    assert fast.config.input_size == FAST_TIER_INPUT_SIZE == 256
    # one checkpoint serves both tiers: identical parameter structure
    assert (jax_tree_structure(exact.params)
            == jax_tree_structure(fast.params))


def jax_tree_structure(tree):
    import jax

    return jax.tree.structure(tree)


def test_scrfd_det_size_follows_tier(tmp_path):
    from facet_tpu.models.face_pipeline import (FAST_TIER_DET_SIZE,
                                                FacePipeline)

    exact = FacePipeline.create(_config(tmp_path))
    assert exact.det_config.input_size == 640
    fast = FacePipeline.create(_config(tmp_path, "fast"))
    assert fast.det_config.input_size == FAST_TIER_DET_SIZE == 448
    assert FAST_TIER_DET_SIZE % max(fast.det_config.strides) == 0


def test_fast_tier_implies_fast_color_harmony(tmp_path, monkeypatch):
    """The fused scorer gets hs_subsample=4 under the fast tier."""
    from facet_tpu.processing.scorer import Facet

    monkeypatch.chdir(tmp_path)
    eng = Facet(config=_config(tmp_path, "fast"))
    assert eng._fused_scorer().hs_subsample == 4
    eng2 = Facet(config=_config(tmp_path))
    assert eng2._fused_scorer().hs_subsample == 1
