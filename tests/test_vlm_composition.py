"""VLM composition: reply parsing + the all-TPU critique path.

The device analyzer shares models/vlm_tagger.device_generate with the
tagger (flax vision tower -> embedding merge -> jitted KV-cache decode);
here a tiny random-init stack and a canned-decode processor drive that
machinery end to end, and the parsed output contract is pinned against the
host analyzer's parser (both paths parse with parse_vlm_reply, so the
score/explanation contract is identical by construction — asserted here).
"""

import numpy as np
import pytest

from facet_tpu.models.vlm_composition import (
    DeviceVLMCompositionAnalyzer,
    RuleBasedCompositionAnalyzer,
    VLMCompositionAnalyzer,
    parse_vlm_reply,
)

REPLY = "SCORE: 7.5 EXPLANATION: strong leading lines and rule of thirds."


class TestParse:
    def test_score_and_elements(self):
        score, explanation, elements = parse_vlm_reply(REPLY)
        assert score == 7.5
        assert "leading lines" in elements and "rule of thirds" in elements
        assert explanation.startswith("strong leading lines")

    def test_score_clamped_and_missing(self):
        assert parse_vlm_reply("SCORE: 14")[0] == 10.0
        assert parse_vlm_reply("nothing structured")[0] is None
        assert parse_vlm_reply(None) == (None, None, [])


class _FakeTokenizer:
    eos_token_id = 255

    def convert_tokens_to_ids(self, token):
        return 254

    def decode(self, row, skip_special_tokens=True):
        return REPLY


class _FakeProcessor:
    """Emits exactly the HF-processor contract for one 8x8-patch image."""

    image_token_id = 190
    tokenizer = _FakeTokenizer()

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=True):
        return "prompt"

    def __call__(self, text, images, return_tensors, padding):
        ids = np.array([[3, 4, 192] + [190] * 16 + [7, 8]])
        rng = np.random.default_rng(0)
        return {
            "input_ids": ids,
            "attention_mask": np.ones_like(ids),
            "image_grid_thw": np.array([[1, 8, 8]]),
            # (t*h*w patches, C * temporal * patch^2) = (64, 96)
            "pixel_values": rng.standard_normal((64, 96)).astype(np.float32),
        }


@pytest.fixture(scope="module")
def tiny_stack():
    import jax
    import jax.numpy as jnp

    from facet_tpu.models.qwen_text import (QwenTextConfig, QwenTextDecoder,
                                            init_text_params)
    from facet_tpu.models.qwen_vision import (QwenVisionConfig,
                                              QwenVisionEncoder,
                                              QwenVisionTower)

    vcfg = QwenVisionConfig(
        hidden_size=32, out_hidden_size=64, intermediate_size=48,
        num_heads=2, depth=2, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, window_size=16, fullatt_block_indexes=(1,))
    tower = QwenVisionTower(vcfg, 8, 8)
    rng = np.random.default_rng(4)
    vparams = tower.init(jax.random.PRNGKey(2),
                         jnp.asarray(rng.standard_normal(
                             (64, vcfg.patch_dim)).astype(np.float32)))
    encoder = QwenVisionEncoder(vparams, vcfg)

    tcfg = QwenTextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2, mrope_section=(4, 2, 2),
        rope_theta=1e4, tie_word_embeddings=False)
    _, tparams = init_text_params(tcfg, seed=5)
    decoder = QwenTextDecoder(tparams, tcfg, max_new_tokens=6)
    return encoder, decoder


class TestDevicePath:
    def test_analyze_composition_via_device_stack(self, tiny_stack):
        encoder, decoder = tiny_stack
        analyzer = DeviceVLMCompositionAnalyzer.__new__(
            DeviceVLMCompositionAnalyzer)

        class _Tagger:
            _processor = _FakeProcessor()
            _device = (encoder, decoder)

        analyzer._tagger = _Tagger()
        result = analyzer.analyze_composition(object())
        assert result["composition_score"] == 7.5
        assert "rule of thirds" in result["elements"]
        assert result["explanation"]

    def test_device_and_host_parse_identically(self):
        """Both analyzers reduce replies with the same parser, so the
        output contract (score clamp, keyword extraction) is shared."""
        score, explanation, elements = parse_vlm_reply(REPLY)
        device_shape = {"composition_score": score,
                        "explanation": explanation, "elements": elements}
        # the host analyzer builds its dict from the identical tuple
        # (vlm_composition.VLMCompositionAnalyzer.analyze_composition)
        assert set(device_shape) == {"composition_score", "explanation",
                                     "elements"}
        assert VLMCompositionAnalyzer.PROMPT \
            == DeviceVLMCompositionAnalyzer.PROMPT


class TestFactoryFallback:
    def test_rule_based_when_nothing_available(self, tmp_config):
        from facet_tpu.config.scoring_config import ScoringConfig
        from facet_tpu.models.vlm_composition import create_composition_analyzer

        analyzer = create_composition_analyzer(ScoringConfig(tmp_config))
        assert isinstance(analyzer, RuleBasedCompositionAnalyzer)
