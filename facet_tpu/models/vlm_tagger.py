"""VLM tagging: Qwen-VL family image taggers.

(reference: models/vlm_tagger.py:29-608) The unified tagger for
Qwen2.5-VL-7B / Qwen3-VL-2B: prompt built from the config's tag vocabulary,
true sub-batched generation with an OOM fallback chain
(batch -> sequential -> skip), and output parsing with Levenshtein snapping
(distance <= 2) onto the vocabulary.

Execution model (fastest available path wins):
1. ALL-TPU: flax vision tower + flax text decoder with a jitted KV-cache
   greedy generate — Qwen2.5 (qwen_vision/qwen_text.py) and Qwen3-VL with
   DeepStack (qwen3_vision/qwen3_text.py) — when the converted checkpoints
   exist; only the tokenizer/processor stays on host.
2. Hybrid: host transformers LLM with the torch visual tower swapped for
   the flax one (Qwen2.5 only).
3. Host transformers end-to-end. Zero-egress environments get a clear
   unavailability error and the profile chain falls back to CLIP tagging.
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


def device_generate(processor, encoder, decoder, pil_images, prompt):
    """All-TPU generation shared by the tagger and the composition critic:
    host tokenization -> flax vision encode -> token/vision embedding merge
    -> jitted KV-cache greedy decode -> decoded reply strings."""
    import numpy as np

    from facet_tpu.models.qwen_text import embed_tokens, rope_index_batch

    messages = [[{"role": "user",
                  "content": [{"type": "image"},
                              {"type": "text", "text": prompt}]}]
                for _ in pil_images]
    texts = [processor.apply_chat_template(
        m, tokenize=False, add_generation_prompt=True) for m in messages]
    inputs = processor(text=texts, images=list(pil_images),
                       return_tensors="np", padding=True)
    ids = np.asarray(inputs["input_ids"])
    valid = np.asarray(inputs["attention_mask"]).astype(bool)
    grid_thw = np.asarray(inputs["image_grid_thw"])

    # pad the prompt length to a bucket so decode programs are reused
    bucket = -(-ids.shape[1] // 64) * 64
    if bucket != ids.shape[1]:
        extra = bucket - ids.shape[1]
        ids = np.pad(ids, ((0, 0), (0, extra)))
        valid = np.pad(valid, ((0, 0), (0, extra)))

    encoded = encoder.encode(
        np.asarray(inputs["pixel_values"], np.float32), grid_thw.tolist())
    deepstack = None
    if isinstance(encoded, tuple):        # Qwen3: (main, deepstack list)
        vis, deepstack = encoded
    else:
        vis = encoded
    embeds = np.array(embed_tokens(decoder.params, ids), np.float32)
    image_token_id = getattr(processor, "image_token_id", None) \
        or processor.tokenizer.convert_tokens_to_ids("<|image_pad|>")
    slots = np.nonzero(ids == image_token_id)
    embeds[slots[0], slots[1]] = vis[:len(slots[0])]

    pos, next_pos = rope_index_batch(ids, valid, grid_thw, image_token_id)
    tok = processor.tokenizer
    eos = {tok.eos_token_id}
    im_end = tok.convert_tokens_to_ids("<|im_end|>")
    if im_end is not None and im_end >= 0:
        eos.add(im_end)
    extra = {}
    if deepstack is not None:
        b, t, e = embeds.shape
        feats = []
        for d in deepstack:
            feat = np.zeros((b, t, e), np.float32)
            feat[slots[0], slots[1]] = d[:len(slots[0])]
            feats.append(feat)
        extra = {"vis_mask": ids == image_token_id, "deep_feats": feats}
    out = decoder.generate(embeds, valid, pos, next_pos,
                           np.asarray(sorted(eos), np.int32), **extra)
    replies = []
    eos_arr = np.asarray(sorted(eos))
    for row in out:
        stop = np.nonzero(np.isin(row, eos_arr))[0]
        end = int(stop[0]) if len(stop) else len(row)
        replies.append(tok.decode(row[:end], skip_special_tokens=True))
    return replies


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
        self._device = None   # (QwenVisionEncoder, QwenTextDecoder) or None

    # ------------------------------------------------------------- loading

    def ensure_loaded(self):
        if self._model is not None or self._device is not None:
            return True
        import os

        # cheap existence probe BEFORE importing torch/transformers: on a
        # weights-less host the imports alone cost minutes, and the fallback
        # chain probes several taggers per scan
        if not os.path.isdir(self.model_path):
            raise RuntimeError(
                f"VLM tagger unavailable: {self.model_path} is not a local"
                " model directory; the profile falls back to CLIP tagging")
        if self._load_device_path():
            return True
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

    def _load_device_path(self):
        """All-device path: flax vision tower + flax text decoder when BOTH
        converted checkpoints exist — Qwen2.5 (models/qwen_text.py) and
        Qwen3-VL (models/qwen3_text.py with DeepStack). Only the tokenizer/
        image processor stays on the host — no torch model is loaded at all
        (the reference's whole tagging path is host transformers,
        models/vlm_tagger.py:327-444)."""
        import os

        is_25 = "2.5" in self.model_name
        from facet_tpu.models.checkpoints import PRETRAINED_DIR

        text_path = os.path.join(
            PRETRAINED_DIR,
            "qwen25_text.npz" if is_25 else "qwen3_text.npz")
        if not os.path.exists(text_path):
            return False
        try:
            import jax
            import jax.numpy as jnp

            from facet_tpu.models.convert import load_params
            from transformers import AutoProcessor

            if is_25:
                from facet_tpu.models.qwen_text import (
                    QwenTextConfig as TCfg,
                    QwenTextDecoder as Decoder,
                )
                from facet_tpu.models.qwen_vision import (
                    QwenVisionEncoder as Encoder,
                )
            else:
                from facet_tpu.models.qwen3_text import (
                    Qwen3TextConfig as TCfg,
                    Qwen3TextDecoder as Decoder,
                )
                from facet_tpu.models.qwen3_vision import (
                    Qwen3VisionEncoder as Encoder,
                )

            encoder = Encoder.load()
            if encoder is None:
                return False
            self._processor = AutoProcessor.from_pretrained(
                self.model_path, local_files_only=True)
            params = load_params(text_path)
            # bf16 weights on device: the decoder must fit HBM
            params = {"params": jax.tree.map(
                lambda a: jnp.asarray(a, jnp.bfloat16), params["params"])}
            extra_kw = {}
            mesh = self._decoder_mesh(TCfg())
            if mesh is not None:
                extra_kw["mesh"] = mesh
            decoder = Decoder(params, TCfg(), dtype=jnp.bfloat16,
                              max_new_tokens=self.max_new_tokens, **extra_kw)
            self._device = (encoder, decoder)
            print("VLM tagger: full TPU path (vision tower + text decoder)")
            return True
        except Exception as exc:
            print(f"VLM tagger: TPU decoder path unavailable ({exc})")
            return False

    @staticmethod
    def _decoder_mesh(text_config):
        """Pick a ('dp', 'tp') mesh for the text decoder, or None.

        The Qwen2.5-VL-7B decoder is ~15.5 GB in bf16 — it cannot share a
        16 GB v5e chip with its KV cache (the reference runs the whole
        model on one 24 GB GPU, models/model_manager.py:652-667), so when
        several devices are visible the decoder tensor-shards over the
        smallest 'tp' that brings per-chip weights under ~60% of HBM,
        leaving room for cache + activations. Remaining devices form the
        'dp' axis for batch parallelism."""
        import jax

        from facet_tpu.models.model_manager import detect_hbm_gb
        from facet_tpu.parallel.mesh import get_mesh
        from facet_tpu.parallel.tp import decoder_hbm_gb, pick_tp

        n = len(jax.devices())
        tp = pick_tp(text_config, n, detect_hbm_gb())
        if tp is None:
            return None
        mesh = get_mesh(dp=n // tp, tp=tp)
        print(f"VLM tagger: decoder tensor-sharded tp={tp} "
              f"({decoder_hbm_gb(text_config, tp):.1f} GB/chip), dp={n // tp}")
        return mesh

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
        if self._device is not None:
            return self._generate_device(chunk)
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

    def _generate_device(self, chunk):
        """All-TPU generation, then vocabulary snapping."""
        encoder, decoder = self._device
        replies = device_generate(self._processor, encoder, decoder,
                                  list(chunk), self.build_prompt())
        return [parse_tag_output(reply, self.vocabulary, self.max_tags)
                for reply in replies]

    def tags_to_string(self, tags):
        return tags_to_string(tags)
