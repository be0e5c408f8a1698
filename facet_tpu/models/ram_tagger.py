"""RAM++ (Recognize Anything Plus) tagger.

(reference: models/ram_tagger.py:42-262 — swin-L, 384px, 6400+ open tags;
the reference itself ships it effectively disabled for excessive memory,
requirements.txt:19-21, with an OOM retry + fallback chain.)

Execution model here mirrors the VLM taggers: the HF release
(xinyu1205/recognize-anything-plus-model) loads through transformers when
present locally; the synonym→vocabulary mapping (the part the engine depends
on) is native and always available — RAM++ emits open-vocabulary tags which
map onto the scoring config's tag vocabulary through the per-tag synonym
lists before category routing.
"""

from facet_tpu.utils.tags import tags_to_string


def build_synonym_index(vocabulary):
    """{tag: [synonyms]} -> {lowercased synonym/tag: tag} reverse index."""
    index = {}
    for tag, synonyms in vocabulary.items():
        index[tag.lower()] = tag
        for syn in synonyms or []:
            index[syn.lower()] = tag
    return index


def map_open_tags(open_tags, synonym_index, max_tags=5):
    """RAM's open-vocabulary output -> config vocabulary tags (deduped)."""
    seen, out = set(), []
    for raw in open_tags:
        tag = synonym_index.get(str(raw).strip().lower())
        if tag and tag not in seen:
            seen.add(tag)
            out.append(tag)
            if len(out) >= max_tags:
                break
    return out


class RAMTagger:
    def __init__(self, config):
        self.config = config
        models = config.get_model_config()
        settings = models.get("ram_plus", {})
        self.model_path = settings.get(
            "model_path", "xinyu1205/recognize-anything-plus-model")
        self.max_tags = config.get_tagging_settings().get("max_tags", 5)
        self.synonym_index = build_synonym_index(config.get_tag_vocabulary())
        self._model = None
        self._processor = None

    def ensure_loaded(self):
        if self._model is not None:
            return True
        import os

        # probe before the minutes-long torch/transformers import
        if not os.path.isdir(self.model_path):
            raise RuntimeError(
                f"RAM++ tagger unavailable: {self.model_path} is not a local"
                " model directory; the tagging fallback chain continues")
        try:
            import torch
            from transformers import AutoModel, AutoProcessor

            self._processor = AutoProcessor.from_pretrained(
                self.model_path, local_files_only=True, trust_remote_code=True)
            self._model = AutoModel.from_pretrained(
                self.model_path, dtype=torch.float16, local_files_only=True,
                trust_remote_code=True).eval()
            return True
        except Exception as exc:
            raise RuntimeError(
                f"RAM++ tagger unavailable ({exc}); the tagging fallback"
                " chain continues with CLIP")

    def tag_batch(self, pil_images):
        """PIL images -> config-vocabulary tag lists (sequential, with an
        OOM retry per image like the reference)."""
        self.ensure_loaded()
        import torch

        results = []
        for img in pil_images:
            for attempt in range(2):
                try:
                    inputs = self._processor(images=img, return_tensors="pt")
                    with torch.no_grad():
                        out = self._model.generate_tag(**inputs)
                    open_tags = [t.strip() for t in str(out[0]).split("|")]
                    results.append(map_open_tags(open_tags, self.synonym_index,
                                                 self.max_tags))
                    break
                except RuntimeError as exc:
                    if "out of memory" in str(exc).lower() and attempt == 0:
                        continue
                    results.append([])
                    break
        return results

    def tags_to_string(self, tags):
        return tags_to_string(tags)
