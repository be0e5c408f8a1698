"""Model fallback chain + RAM tagger mapping tests."""

import numpy as np
import pytest


class TestRamMapping:
    def test_synonym_index_and_mapping(self, scoring_config):
        from facet_tpu.models.ram_tagger import build_synonym_index, map_open_tags

        vocab = scoring_config.get_tag_vocabulary()
        index = build_synonym_index(vocab)
        # direct tag names map to themselves
        assert index["animal"] == "animal"
        # synonyms map back to the canonical tag
        assert index["bird in flight"] == "animal"
        mapped = map_open_tags(
            ["Bird in Flight", "unknown thing", "mountain range", "animal"],
            index, max_tags=5)
        assert mapped == ["animal", "mountain"]

    def test_unavailable_raises_cleanly(self, scoring_config):
        from facet_tpu.models.ram_tagger import RAMTagger

        tagger = RAMTagger(scoring_config)
        with pytest.raises(RuntimeError, match="unavailable"):
            tagger.ensure_loaded()


class TestFallbackChain:
    def test_vlm_falls_through_to_skip(self, tmp_path, scoring_config):
        """With no VLM weights installed the chain walks vlm->qwen3->ram and
        ends with a clean skip (clip tagging continues implicitly)."""
        from facet_tpu.models.model_manager import ModelManager
        from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor
        from facet_tpu.processing.scorer import Facet

        scorer = Facet(str(tmp_path / "t.db"), scoring_config, lightweight=True)
        proc = ChunkedMultiPassProcessor(scorer)
        name, model = proc._load_with_fallback("vlm_tagger")
        assert model is None  # every tagger in the chain is weightless here

    def test_topiq_falls_back_to_clipiqa(self, tmp_path, monkeypatch):
        """If TOPIQ construction fails, clipiqa (CLIP-based) takes over."""
        import json

        from facet_tpu.config.default_config import build_default_config
        from facet_tpu.config.scoring_config import ScoringConfig
        from facet_tpu.processing.multi_pass import ChunkedMultiPassProcessor
        from facet_tpu.processing.scorer import Facet

        cfg = build_default_config()
        cfg["models"]["clip"]["architecture"] = {
            "image_size": 28, "patch_size": 14, "width": 32, "layers": 1,
            "heads": 2, "projection_dim": 768}
        path = str(tmp_path / "cfg.json")
        json.dump(cfg, open(path, "w"))
        config = ScoringConfig(path)

        scorer = Facet(str(tmp_path / "t.db"), config)
        proc = ChunkedMultiPassProcessor(scorer)

        def boom(config=None, cached=None):
            raise RuntimeError("no topiq checkpoint")

        scorer.models._factories["topiq"] = boom
        name, model = proc._load_with_fallback("topiq")
        assert name == "clipiqa" and model is not None
        rng = np.random.default_rng(0)
        scores = model.score_batch([rng.integers(0, 256, (50, 60, 3),
                                                 dtype=np.uint8)])
        assert 0 <= scores[0] <= 10
