"""VLM tagging: Qwen-VL family image taggers.

(reference: models/vlm_tagger.py:29-608) The unified tagger for
Qwen2.5-VL-7B / Qwen3-VL-2B: prompt built from the config's tag vocabulary,
true sub-batched generation with an OOM fallback chain
(batch -> sequential -> skip), and output parsing with Levenshtein snapping
(distance <= 2) onto the vocabulary.

Round-1 execution model: the Qwen towers run through Hugging Face
transformers on host (weights load from a local path; zero-egress
environments get a clear unavailability error and the profile chain falls
back to CLIP tagging). A flax port of the Qwen vision tower is the planned
TPU path.
"""

from facet_tpu.utils.tags import tags_to_string


def levenshtein(a, b, cap=3):
    """Edit distance with an early-exit cap."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        best = cur[0]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
            best = min(best, cur[j])
        if best > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def snap_to_vocabulary(word, vocabulary, max_distance=2):
    """Snap a generated token onto the nearest vocabulary tag, or None."""
    word = word.strip().lower()
    if not word:
        return None
    if word in vocabulary:
        return word
    best, best_d = None, max_distance + 1
    for tag in vocabulary:
        d = levenshtein(word, tag, cap=max_distance)
        if d < best_d:
            best, best_d = tag, d
    return best if best_d <= max_distance else None


def parse_tag_output(text, vocabulary, max_tags=5):
    """Model output -> deduped list of vocabulary tags."""
    for sep in ("\n", ";"):
        text = text.replace(sep, ",")
    seen, out = set(), []
    for part in text.split(","):
        tag = snap_to_vocabulary(part, vocabulary)
        if tag and tag not in seen:
            seen.add(tag)
            out.append(tag)
            if len(out) >= max_tags:
                break
    return out


class VLMTagger:
    """Qwen-VL tagger with family autodetection from the model path."""

    def __init__(self, config, model_name=None):
        self.config = config
        models = config.get_model_config()
        self.model_name = model_name or "qwen2.5-vl-7b"
        key = "qwen2_5_vl_7b" if "2.5" in self.model_name else "qwen3_vl_2b"
        settings = models.get(key, {})
        self.model_path = settings.get("model_path", "Qwen/Qwen2.5-VL-7B-Instruct")
        self.batch_size = settings.get("vlm_batch_size", 2)
        self.max_new_tokens = settings.get("max_new_tokens", 100)
        self.vocabulary = sorted(config.get_tag_vocabulary().keys())
        self.max_tags = config.get_tagging_settings().get("max_tags", 5)
        self._model = None
        self._processor = None

    # ------------------------------------------------------------- loading

    def ensure_loaded(self):
        if self._model is not None:
            return True
        import os

        # cheap existence probe BEFORE importing torch/transformers: on a
        # weights-less host the imports alone cost minutes, and the fallback
        # chain probes several taggers per scan
        if not os.path.isdir(self.model_path):
            raise RuntimeError(
                f"VLM tagger unavailable: {self.model_path} is not a local"
                " model directory; the profile falls back to CLIP tagging")
        try:
            import torch
            from transformers import AutoModelForVision2Seq, AutoProcessor

            self._processor = AutoProcessor.from_pretrained(
                self.model_path, local_files_only=True)
            self._model = AutoModelForVision2Seq.from_pretrained(
                self.model_path, dtype=torch.bfloat16, local_files_only=True
            ).eval()
            self._attach_tpu_vision()
            return True
        except Exception as exc:
            raise RuntimeError(
                f"VLM tagger unavailable: {self.model_path} not present"
                f" locally ({exc}); the profile falls back to CLIP tagging")

    def _attach_tpu_vision(self):
        """Swap the torch visual tower for the flax one when converted
        weights exist (pretrained_models/qwen25_vision.npz): image encoding
        runs on TPU, everything else (mrope, generation) stays upstream."""
        if "2.5" not in self.model_name:
            return  # qwen3-vl has a different vision architecture
        try:
            from facet_tpu.models.qwen_vision import QwenVisionEncoder

            encoder = QwenVisionEncoder.load()
            if encoder is None:
                return
            import torch

            class _TPUVisual(torch.nn.Module):
                dtype = torch.float32

                def __init__(self, enc, out_dtype):
                    super().__init__()
                    self._enc = enc
                    self._out_dtype = out_dtype

                def forward(self, hidden_states, grid_thw=None, **kwargs):
                    out = self._enc.encode(
                        hidden_states.detach().cpu().float().numpy(),
                        grid_thw.tolist())
                    return torch.from_numpy(out).to(self._out_dtype)

            holder = self._model.model if hasattr(self._model, "model") \
                and hasattr(self._model.model, "visual") else self._model
            holder.visual = _TPUVisual(encoder, next(
                self._model.get_input_embeddings().parameters()).dtype)
            print("VLM tagger: vision tower running on the TPU"
                  " (qwen25_vision.npz)")
        except Exception as exc:
            print(f"VLM tagger: TPU vision path unavailable ({exc});"
                  " using the torch visual tower")

    def build_prompt(self):
        vocab = ", ".join(self.vocabulary)
        return (
            "Look at this photo and list the matching tags from this exact"
            f" vocabulary (comma separated, at most {self.max_tags}):"
            f" {vocab}. Reply with only the tags.")

    # ------------------------------------------------------------- tagging

    def tag_batch(self, pil_images):
        """PIL images -> list of tag lists, sub-batched with OOM fallback."""
        self.ensure_loaded()
        results = []
        pos = 0
        batch = self.batch_size
        while pos < len(pil_images):
            chunk = pil_images[pos:pos + batch]
            try:
                results.extend(self._generate(chunk))
                pos += len(chunk)
            except RuntimeError as exc:
                if "out of memory" in str(exc).lower() and batch > 1:
                    batch = 1   # fall back to sequential
                    continue
                results.extend([[] for _ in chunk])  # skip on hard failure
                pos += len(chunk)
        return results

    def _generate(self, chunk):
        import torch

        prompt = self.build_prompt()
        messages = [[{"role": "user",
                      "content": [{"type": "image"},
                                  {"type": "text", "text": prompt}]}]
                    for _ in chunk]
        texts = [self._processor.apply_chat_template(
            m, tokenize=False, add_generation_prompt=True) for m in messages]
        inputs = self._processor(text=texts, images=list(chunk),
                                 return_tensors="pt", padding=True)
        with torch.no_grad():
            out = self._model.generate(**inputs,
                                       max_new_tokens=self.max_new_tokens,
                                       do_sample=False)
        replies = self._processor.batch_decode(
            out[:, inputs["input_ids"].shape[1]:], skip_special_tokens=True)
        return [parse_tag_output(reply, self.vocabulary, self.max_tags)
                for reply in replies]

    def tags_to_string(self, tags):
        return tags_to_string(tags)
