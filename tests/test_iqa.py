"""IQA registry tests: contract + scorer behavior for every member."""

import numpy as np
import pytest

from facet_tpu.models.iqa import IQA_REGISTRY, cap_long_edge, create_iqa_scorer

TINY_ARCH = {"image_size": 28, "patch_size": 14, "width": 32, "layers": 1,
             "heads": 2, "projection_dim": 768}


@pytest.fixture
def tiny_config(tmp_path):
    import json

    from facet_tpu.config.default_config import build_default_config
    from facet_tpu.config.scoring_config import ScoringConfig

    cfg = build_default_config()
    cfg["models"]["clip"]["architecture"] = TINY_ARCH
    path = str(tmp_path / "cfg.json")
    json.dump(cfg, open(path, "w"))
    return ScoringConfig(path)


def test_registry_contract():
    assert set(IQA_REGISTRY) == {"topiq", "clipiqa+", "hyperiqa", "dbcnn", "musiq"}
    for name, entry in IQA_REGISTRY.items():
        assert 0 < entry["srcc"] <= 1
        assert len(entry["range"]) == 2


@pytest.mark.parametrize("name", ["clipiqa+"])
def test_clip_based_scorer(tiny_config, name):
    scorer = create_iqa_scorer(name, tiny_config)
    rng = np.random.default_rng(0)
    scores = scorer.score_batch(
        [rng.integers(0, 256, (60, 90, 3), dtype=np.uint8) for _ in range(2)])
    assert len(scores) == 2
    assert all(0 <= s <= 10 for s in scores)


@pytest.mark.parametrize("name", ["hyperiqa", "dbcnn"])
def test_deep_scorers(tiny_config, name):
    scorer = create_iqa_scorer(name, tiny_config)
    if name == "dbcnn":
        # shrink the eval resolution so random-init CPU tests stay fast
        # (hyperiqa's lda grid dims bake in its 224 input — no override)
        scorer.input_size = 96
    rng = np.random.default_rng(1)
    scores = scorer.score_batch(
        [rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)])
    assert len(scores) == 1 and 0 <= scores[0] <= 10
    # deterministic across calls (inference BatchNorm, fixed params)
    again = scorer.score_batch(
        [rng.integers(0, 256, (64, 80, 3), dtype=np.uint8) * 0 + 128])
    assert 0 <= again[0] <= 10


def test_musiq(tiny_config):
    from facet_tpu.models.musiq import MUSIQConfig, MUSIQScorer

    tiny = MUSIQConfig(hidden=48, mlp_dim=96, layers=1, heads=2,
                       root_width=32, longer_side_lengths=(64,),
                       max_native_side=96)
    scorer = MUSIQScorer.create(tiny_config, musiq_config=tiny)
    rng = np.random.default_rng(2)
    scores = scorer.score_batch(
        [rng.integers(0, 256, (100, 70, 3), dtype=np.uint8) for _ in range(2)])
    assert len(scores) == 2 and all(0 <= s <= 10 for s in scores)


def test_unknown_model_rejected(tiny_config):
    with pytest.raises(KeyError):
        create_iqa_scorer("nope", tiny_config)


def test_cap_long_edge():
    rng = np.random.default_rng(0)
    big = rng.integers(0, 256, (800, 3000, 3), dtype=np.uint8)
    capped = cap_long_edge(big, 1024)
    assert max(capped.shape[:2]) == 1024
    small = rng.integers(0, 256, (100, 200, 3), dtype=np.uint8)
    assert cap_long_edge(small, 1024) is small
