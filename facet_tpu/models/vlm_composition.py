"""VLM composition analysis + rule-based fallback.

(reference: models/vlm_composition.py:25-299) The 24gb profile asks a small
VLM to critique composition ("SCORE: n / EXPLANATION: ..."), regex-parsed
with composition-element keyword extraction; every other profile uses the
rule-based analyzer (subject placement + leading lines).
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
    """Profile-driven factory (reference: vlm_composition.py:277-299)."""
    model = config.get_model_for_task("composition")
    if model in ("qwen2-vl-2b",):
        try:
            analyzer = VLMCompositionAnalyzer(config)
            analyzer.ensure_loaded()
            return analyzer
        except RuntimeError:
            pass
    return RuleBasedCompositionAnalyzer(config)
