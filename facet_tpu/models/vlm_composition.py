"""VLM composition analysis: device flax stack, host VLM, rule fallback.

(reference: models/vlm_composition.py:25-299) The 24gb profile asks a small
VLM to critique composition ("SCORE: n / EXPLANATION: ..."), regex-parsed
with composition-element keyword extraction; every other profile uses the
rule-based analyzer (subject placement + leading lines).

TPU-first execution order: when converted Qwen checkpoints exist, the
critique runs the same all-TPU stack as the tagger (flax vision tower +
jitted KV-cache decode via models/vlm_tagger.device_generate) — preferring
the 2B Qwen3-VL; the host-transformers Qwen2-VL path remains as compat
middle ground, and the geometric analyzer is the final fallback.
"""

import re

COMPOSITION_KEYWORDS = [
    "rule of thirds", "leading lines", "symmetry", "framing", "balance",
    "depth", "negative space", "golden ratio", "diagonal", "centered",
    "foreground", "background", "horizon", "perspective",
]

_SCORE_RE = re.compile(r"SCORE[:\s]+(\d+(?:\.\d+)?)", re.IGNORECASE)
_EXPLAIN_RE = re.compile(r"EXPLANATION[:\s]+(.+)", re.IGNORECASE | re.DOTALL)


def parse_vlm_reply(text):
    """-> (score or None, explanation, [composition elements])."""
    score = None
    match = _SCORE_RE.search(text or "")
    if match:
        try:
            score = max(0.0, min(10.0, float(match.group(1))))
        except ValueError:
            score = None
    explain_match = _EXPLAIN_RE.search(text or "")
    explanation = explain_match.group(1).strip() if explain_match else None
    lower = (text or "").lower()
    elements = [kw for kw in COMPOSITION_KEYWORDS if kw in lower]
    return score, explanation, elements


class VLMCompositionAnalyzer:
    """Qwen2-VL-2B composition critic (host transformers execution)."""

    PROMPT = (
        "Rate this photo's composition from 0 to 10 and explain briefly."
        " Reply exactly as: SCORE: <number> EXPLANATION: <one sentence"
        " mentioning the composition techniques used>")

    def __init__(self, config):
        self.config = config
        settings = config.get_model_config().get("qwen2_vl", {})
        self.model_path = settings.get("model_path", "Qwen/Qwen2-VL-2B-Instruct")
        self.max_new_tokens = settings.get("max_new_tokens", 256)
        self._model = None
        self._processor = None

    def ensure_loaded(self):
        if self._model is not None:
            return True
        import os

        # probe before the minutes-long torch/transformers import
        if not os.path.isdir(self.model_path):
            raise RuntimeError(
                f"VLM composition unavailable: {self.model_path} is not a"
                " local model directory; falling back to rule-based analysis")
        try:
            import torch
            from transformers import AutoModelForVision2Seq, AutoProcessor

            self._processor = AutoProcessor.from_pretrained(
                self.model_path, local_files_only=True)
            self._model = AutoModelForVision2Seq.from_pretrained(
                self.model_path, dtype=torch.bfloat16, local_files_only=True
            ).eval()
            return True
        except Exception as exc:
            raise RuntimeError(
                f"VLM composition unavailable ({exc});"
                " falling back to rule-based analysis")

    def analyze_composition(self, pil_image):
        """-> {composition_score, explanation, elements}."""
        self.ensure_loaded()
        import torch

        messages = [{"role": "user",
                     "content": [{"type": "image"},
                                 {"type": "text", "text": self.PROMPT}]}]
        text = self._processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True)
        inputs = self._processor(text=[text], images=[pil_image],
                                 return_tensors="pt")
        with torch.no_grad():
            out = self._model.generate(**inputs,
                                       max_new_tokens=self.max_new_tokens,
                                       do_sample=False)
        reply = self._processor.batch_decode(
            out[:, inputs["input_ids"].shape[1]:], skip_special_tokens=True)[0]
        score, explanation, elements = parse_vlm_reply(reply)
        return {"composition_score": score, "explanation": explanation,
                "elements": elements}


class DeviceVLMCompositionAnalyzer:
    """Composition critic on the all-TPU Qwen stack.

    TPU-first replacement for the reference's host Qwen2-VL-2B critique
    (models/vlm_composition.py:25-173): when converted flax checkpoints
    exist, the critique reuses the tagger's vision tower + jitted KV-cache
    decoder (models/vlm_tagger.device_generate) — the 2B Qwen3-VL stack is
    preferred for its size, falling back to Qwen2.5-VL. Only the prompt
    differs from tagging; no torch model is loaded."""

    PROMPT = VLMCompositionAnalyzer.PROMPT

    def __init__(self, config):
        from facet_tpu.models.vlm_tagger import VLMTagger

        self._tagger = None
        for name in ("qwen3-vl-2b", "qwen2.5-vl-7b"):
            tagger = VLMTagger(config, model_name=name)
            try:
                if tagger._load_device_path():
                    self._tagger = tagger
                    break
            except Exception:
                continue
        if self._tagger is None:
            raise RuntimeError(
                "VLM composition (device) unavailable: no converted Qwen"
                " checkpoints under pretrained_models/")

    def analyze_composition(self, pil_image):
        from facet_tpu.models.vlm_tagger import device_generate

        encoder, decoder = self._tagger._device
        reply = device_generate(self._tagger._processor, encoder, decoder,
                                [pil_image], self.PROMPT)[0]
        score, explanation, elements = parse_vlm_reply(reply)
        return {"composition_score": score, "explanation": explanation,
                "elements": elements}


class RuleBasedCompositionAnalyzer:
    """Fallback: the geometric analyzer wrapped in the VLM interface."""

    def __init__(self, config):
        from facet_tpu.analyzers.composition import CompositionAnalyzer

        self.analyzer = CompositionAnalyzer(config)

    def analyze_composition(self, pil_image):
        import numpy as np

        rgb = np.asarray(pil_image.convert("RGB"), dtype=np.uint8)
        result = self.analyzer.analyze(rgb)
        return {"composition_score": result["score"], "explanation": None,
                "elements": ["leading lines"] if result["leading_lines_score"] > 3
                else []}


def create_composition_analyzer(config):
    """Profile-driven factory (reference: vlm_composition.py:277-299):
    device flax stack first, host transformers second, rules last."""
    model = config.get_model_for_task("composition")
    if model in ("qwen2-vl-2b",):
        try:
            return DeviceVLMCompositionAnalyzer(config)
        except RuntimeError:
            pass
        try:
            analyzer = VLMCompositionAnalyzer(config)
            analyzer.ensure_loaded()
            return analyzer
        except RuntimeError:
            pass
    return RuleBasedCompositionAnalyzer(config)
