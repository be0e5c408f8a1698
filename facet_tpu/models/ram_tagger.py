"""RAM++ (Recognize Anything Plus) tagger.

(reference: models/ram_tagger.py:42-262 — swin-L, 384px, 6400+ open tags;
the reference itself ships it effectively disabled for excessive memory,
requirements.txt:19-21, with an OOM retry + fallback chain.)

Three-tier execution, device first (mirrors the VLM taggers):

1. **flax on TPU** — a converted ram_plus.npz (tools/convert_checkpoints.py)
   plus the published tag list / per-class thresholds load into
   models/ram_plus.py's RAMPlusNet: Swin-L encoder, description
   reweighting, cross-attention tag decoding, all one jitted program per
   source shape;
2. **host transformers** — the HF release directory when only that exists;
3. neither -> RuntimeError, and the engine's tagging fallback chain
   continues with CLIP.

The synonym→vocabulary mapping (the part the engine depends on) is native
and always available — RAM++ emits open-vocabulary tags which map onto the
scoring config's tag vocabulary through the per-tag synonym lists before
category routing.
"""

import os

import numpy as np

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


def config_from_params(params, image_size=384):
    """Infer the RAMPlusConfig a converted checkpoint implies (class count,
    descriptions per class, head widths, swin geometry) from parameter
    shapes. image_size is the one thing shapes can't tell (384 for every
    published RAM++ release)."""
    import math

    from facet_tpu.models.ram_plus import RAMPlusConfig
    from facet_tpu.models.swin import SwinConfig

    p = params["params"]
    num_class, hidden = p["fc_w"].shape
    embeds, embed_width = p["label_embed"].shape
    layers = sum(1 for k in p if k.startswith("tag_layer"))

    enc = p["visual_encoder"]
    depth_by_stage = {}
    for k in enc:
        if "_block" in k:
            stage, blk = k.split("_block")
            i = int(stage.removeprefix("layers"))
            depth_by_stage[i] = max(depth_by_stage.get(i, 0), int(blk) + 1)
    depths = tuple(depth_by_stage[i] for i in sorted(depth_by_stage))
    heads = tuple(
        int(enc[f"layers{i}_block0"]["attn"]
            ["relative_position_bias_table"].shape[1])
        for i in sorted(depth_by_stage))
    table_rows = int(
        enc["layers0_block0"]["attn"]["relative_position_bias_table"].shape[0])
    window = (int(math.isqrt(table_rows)) + 1) // 2
    swin = SwinConfig(
        image_size=image_size,
        embed_dim=int(enc["patch_proj"]["kernel"].shape[-1]),
        depths=depths, heads=heads, window=window)
    return RAMPlusConfig(
        num_class=int(num_class), des_per_class=int(embeds // num_class),
        embed_width=int(embed_width), hidden=int(hidden), layers=layers,
        intermediate=int(p["tag_layer0"]["ffn_in"]["kernel"].shape[1]),
        swin=swin)


class RAMTagger:
    max_device_batch = 16    # Swin-L 384 activations; sub-batch like TOPIQ

    def __init__(self, config):
        self.config = config
        models = config.get_model_config()
        settings = models.get("ram_plus", {})
        self.model_path = settings.get(
            "model_path", "xinyu1205/recognize-anything-plus-model")
        self.max_tags = config.get_tagging_settings().get("max_tags", 5)
        self.image_size = settings.get("image_size", 384)
        self.synonym_index = build_synonym_index(config.get_tag_vocabulary())
        self._model = None          # host transformers model
        self._processor = None
        self._net = None            # flax RAMPlusNet
        self._params = None
        self._tag_list = None
        self._thresholds = None
        self._programs = {}

    # ------------------------------------------------------------ flax tier
    def _try_load_device(self):
        from facet_tpu.models import checkpoints
        from facet_tpu.models.checkpoints import load_or_none

        params = load_or_none("ram_plus")
        tag_path = os.path.join(checkpoints.PRETRAINED_DIR,
                                "ram_tag_list.txt")
        if params is None or not os.path.exists(tag_path):
            return False
        from facet_tpu.models.ram_plus import RAMPlusNet

        with open(tag_path, encoding="utf-8") as fh:
            self._tag_list = [line.strip() for line in fh if line.strip()]
        cfg = config_from_params(params, self.image_size)
        if len(self._tag_list) != cfg.num_class:
            raise RuntimeError(
                f"ram_plus tag list has {len(self._tag_list)} entries but the"
                f" checkpoint decodes {cfg.num_class} classes")
        thr_path = os.path.join(checkpoints.PRETRAINED_DIR,
                                "ram_tag_list_threshold.txt")
        if os.path.exists(thr_path):
            with open(thr_path, encoding="utf-8") as fh:
                self._thresholds = np.array(
                    [float(line) for line in fh if line.strip()], np.float64)
        else:
            self._thresholds = np.full(cfg.num_class, cfg.default_threshold)
        self._net = RAMPlusNet(cfg)
        self._params = params
        return True

    def _device_program(self, h, w):
        key = (h, w)
        if key not in self._programs:
            import jax
            import jax.numpy as jnp

            from facet_tpu.models.ram_plus import RAM_MEAN, RAM_STD
            from facet_tpu.ops.resize import resample_matrix

            size = self._net.config.swin.image_size
            rows = jnp.asarray(resample_matrix(h, size, method="linear"))
            cols = jnp.asarray(resample_matrix(w, size, method="linear"))

            @jax.jit
            def run(params, batch_u8):
                x = batch_u8.astype(jnp.float32)
                x = jnp.einsum("rh,bhwc->brwc", rows, x)
                x = jnp.einsum("sw,brwc->brsc", cols, x) / 255.0
                return self._net.apply(params, (x - RAM_MEAN) / RAM_STD)

            self._programs[key] = run
        return self._programs[key]

    def _tag_batch_device(self, np_images):
        """uint8 RGB arrays (one shape bucket at a time) -> tag lists."""
        import jax

        from facet_tpu.models.ram_plus import decode_tags

        results = [None] * len(np_images)
        by_shape = {}
        for i, img in enumerate(np_images):
            by_shape.setdefault(img.shape[:2], []).append(i)
        for (h, w), idxs in by_shape.items():
            run = self._device_program(h, w)
            for start in range(0, len(idxs), self.max_device_batch):
                part = idxs[start:start + self.max_device_batch]
                batch = np.stack([np_images[i] for i in part])
                logits = jax.device_get(run(self._params, batch))
                for i, open_tags in zip(part, decode_tags(
                        logits, self._thresholds, self._tag_list)):
                    results[i] = map_open_tags(
                        open_tags, self.synonym_index, self.max_tags)
        return results

    # ------------------------------------------------------------ host tier
    def ensure_loaded(self):
        if self._net is not None or self._model is not None:
            return True
        if self._try_load_device():
            return True

        # probe before the minutes-long torch/transformers import
        if not os.path.isdir(self.model_path):
            raise RuntimeError(
                f"RAM++ tagger unavailable: no converted ram_plus.npz and"
                f" {self.model_path} is not a local model directory; the"
                " tagging fallback chain continues")
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
        """PIL images -> config-vocabulary tag lists."""
        self.ensure_loaded()
        if self._net is not None:
            return self._tag_batch_device(
                [np.asarray(img.convert("RGB")) for img in pil_images])
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
