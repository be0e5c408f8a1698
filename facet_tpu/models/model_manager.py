"""Model lifecycle: loading, HBM budgeting, pass planning, host-RAM caching.

The reference manages CUDA VRAM by bin-packing model passes and caching
unloaded models in CPU RAM (models/model_manager.py:24-810). The TPU
equivalents:

- "VRAM" becomes per-device HBM (detected from the JAX backend);
- "unload" drops device arrays (XLA frees HBM when the last reference dies)
  while parameters stay pinned in host RAM as numpy trees, so the next load
  is a host->device transfer instead of disk IO / re-init;
- pass grouping is the same first-fit-decreasing bin packing over the HBM
  budget (capacity = HBM - 1 GB headroom, or RAM - 2 GB in CPU mode).
"""

import jax


def detect_hbm_gb():
    """Per-device accelerator memory in GB, or 0.0 in CPU mode."""
    try:
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return 0.0
        stats = dev.memory_stats()
        if stats and "bytes_limit" in stats:
            return stats["bytes_limit"] / (1024 ** 3)
        return 16.0  # v5e-class default when stats are unavailable
    except Exception:
        return 0.0


def detect_ram_gb():
    try:
        import psutil

        return psutil.virtual_memory().total / (1024 ** 3)
    except Exception:
        return 8.0


# Approximate per-model device memory footprints in GB (params in bf16 +
# activation headroom at the default batch size).
MODEL_HBM_REQUIREMENTS = {
    "clip": 2.0,            # ViT-L/14 vision tower + aesthetic head
    "clip_aesthetic": 0.1,  # head only (recompute path)
    "samp_net": 0.6,        # U2-Net-P + SAMP-Net
    "insightface": 0.8,     # SCRFD + landmarks + ArcFace
    "topiq": 1.5,           # ResNet50 + cross-scale attention
    "hyperiqa": 1.5,        # ResNet50 + hyper network
    "dbcnn": 1.2,           # VGG16 + SCNN bilinear pooling
    "musiq": 0.8,           # multi-scale patch transformer
    "clipiqa": 2.0,         # CLIP towers + antonym prompts
    "vlm_tagger": 18.0,     # Qwen2.5-VL-7B bf16, single-chip figure; on a
                            # multi-chip mesh the text decoder tensor-shards
                            # over 'tp' (parallel/tp.py: ~8.8 GB/chip at
                            # tp=2, ~4.4 at tp=4), which is how it fits
                            # 16 GB v5e chips at all
    "qwen3_vl_tagger": 7.0, # Qwen3-VL-2B bf16
    "ram_tagger": 14.0,     # RAM++ swin-L @384px
}

# Host-RAM footprints used when no accelerator is present (CPU mode).
MODEL_RAM_REQUIREMENTS = {
    "clip": 3.0,
    "clip_aesthetic": 0.2,
    "samp_net": 1.0,
    "insightface": 1.2,
    "topiq": 2.0,
    "hyperiqa": 2.0,
    "dbcnn": 1.8,
    "musiq": 1.5,
    "clipiqa": 3.0,
    "vlm_tagger": 30.0,
    "qwen3_vl_tagger": 9.0,
    "ram_tagger": 16.0,
}

# Quality (NR-IQA) models whose score replaces the CLIP aesthetic in the
# aggregate, in the reference's preference order (multi_pass.py:989-1028).
QUALITY_MODELS = ("topiq", "hyperiqa", "dbcnn", "musiq", "clipiqa")

# Accuracy metadata surfaced by --list-models (README/docs claims of the
# underlying published models).
MODEL_INFO = {
    "topiq": {"srcc": 0.93, "task": "aesthetic", "desc": "TOPIQ NR-IQA (ResNet50)"},
    "hyperiqa": {"srcc": 0.90, "task": "aesthetic", "desc": "HyperIQA (ResNet50 + hyper net)"},
    "dbcnn": {"srcc": 0.90, "task": "aesthetic", "desc": "DBCNN (VGG16 + SCNN bilinear)"},
    "musiq": {"srcc": 0.87, "task": "aesthetic", "desc": "MUSIQ multi-scale transformer"},
    "clipiqa": {"srcc": 0.86, "task": "aesthetic", "desc": "CLIP-IQA+ antonym prompts"},
    "clip": {"srcc": 0.76, "task": "aesthetic", "desc": "CLIP ViT-L/14 + MLP head"},
    "samp_net": {"srcc": None, "task": "composition", "desc": "SAMP-Net (8 pooling patterns)"},
    "insightface": {"srcc": None, "task": "faces", "desc": "SCRFD det + 106 landmarks + ArcFace"},
    "vlm_tagger": {"srcc": None, "task": "tagging", "desc": "Qwen2.5-VL-7B tagger"},
    "qwen3_vl_tagger": {"srcc": None, "task": "tagging", "desc": "Qwen3-VL-2B tagger"},
    "ram_tagger": {"srcc": None, "task": "tagging", "desc": "RAM++ open-vocabulary tagger"},
    "clip_aesthetic": {"srcc": 0.76, "task": "aesthetic", "desc": "aesthetic head on stored embeddings"},
}

# Config vocabulary -> factory name for the quality ("aesthetic") task.
QUALITY_MODEL_ALIASES = {
    "topiq": "topiq",
    "hyperiqa": "hyperiqa",
    "dbcnn": "dbcnn",
    "musiq": "musiq",
    "musiq-koniq": "musiq",
    "clipiqa": "clipiqa",
    "clipiqa+": "clipiqa",
    "clip-iqa+": "clipiqa",
}


class ModelManager:
    """Loads/unloads ensemble members against an HBM budget."""

    def __init__(self, config=None, hbm_gb=None):
        self.config = config
        self.hbm_gb = detect_hbm_gb() if hbm_gb is None else hbm_gb
        self.loaded = {}          # name -> live model object
        self._host_cache = {}     # name -> host-RAM param tree (numpy)
        self.cache_hits = 0
        self.cache_misses = 0
        self._factories = {}
        self._register_default_factories()

    # ---------------------------------------------------------- registry

    def register(self, name, factory):
        """factory(config, host_params_or_None) -> model object with
        optional .host_params() for RAM caching."""
        self._factories[name] = factory

    def _register_default_factories(self):
        def make_clip(config, cached):
            from facet_tpu.models.aesthetic import AestheticScorer
            from facet_tpu.models.checkpoints import (
                clip_vision_config_from,
                load_clip_vision_params,
            )

            clip_settings = config.get_clip_settings() if config else {}
            vcfg = clip_vision_config_from(clip_settings)
            vision, head = load_clip_vision_params(cached, vcfg)
            return AestheticScorer(vision_params=vision, head_params=head, config=vcfg)

        def make_samp(config, cached):
            from facet_tpu.models.samp_net import SAMPComposition

            return SAMPComposition.create(config, cached)

        def make_insightface(config, cached):
            from facet_tpu.models.face_pipeline import FacePipeline

            return FacePipeline.create(config, cached)

        def make_topiq(config, cached):
            from facet_tpu.models.topiq import TOPIQScorer

            return TOPIQScorer.create(config, cached)

        def make_vlm(config, cached):
            from facet_tpu.models.vlm_tagger import VLMTagger

            tagger = VLMTagger(config, model_name="qwen2.5-vl-7b")
            tagger.ensure_loaded()  # raises a clear error when weights absent
            return tagger

        def make_qwen3(config, cached):
            from facet_tpu.models.vlm_tagger import VLMTagger

            tagger = VLMTagger(config, model_name="qwen3-vl-2b")
            tagger.ensure_loaded()
            return tagger

        def make_clipiqa(config, cached):
            from facet_tpu.models.iqa import CLIPIQAScorer

            return CLIPIQAScorer.create(config, cached)

        def make_hyperiqa(config, cached):
            from facet_tpu.models.iqa_extra import HyperIQAScorer

            return HyperIQAScorer.create(config, cached)

        def make_dbcnn(config, cached):
            from facet_tpu.models.iqa_extra import DBCNNScorer

            return DBCNNScorer.create(config, cached)

        def make_musiq(config, cached):
            from facet_tpu.models.musiq import MUSIQScorer

            return MUSIQScorer.create(config, cached)

        def make_ram(config, cached):
            from facet_tpu.models.ram_tagger import RAMTagger

            tagger = RAMTagger(config)
            tagger.ensure_loaded()
            return tagger

        self._factories["clip"] = make_clip
        self._factories["samp_net"] = make_samp
        self._factories["insightface"] = make_insightface
        self._factories["topiq"] = make_topiq
        self._factories["vlm_tagger"] = make_vlm
        self._factories["qwen3_vl_tagger"] = make_qwen3
        self._factories["ram_tagger"] = make_ram
        self._factories["clipiqa"] = make_clipiqa
        self._factories["hyperiqa"] = make_hyperiqa
        self._factories["dbcnn"] = make_dbcnn
        self._factories["musiq"] = make_musiq

    # ---------------------------------------------------------- lifecycle

    def load_model(self, name):
        if name in self.loaded:
            return self.loaded[name]
        if name not in self._factories:
            raise KeyError(f"unknown model '{name}' (known: {sorted(self._factories)})")
        cached = self._host_cache.get(name)
        if cached is not None:
            self.cache_hits += 1
        else:
            self.cache_misses += 1
        model = self._factories[name](self.config, cached)
        self.loaded[name] = model
        return model

    def unload_model(self, name):
        """Drop device arrays; pin params in host RAM for fast reload."""
        model = self.loaded.pop(name, None)
        if model is None:
            return
        host_params = getattr(model, "host_params", None)
        if callable(host_params):
            try:
                if self._ram_headroom_ok():
                    self._host_cache[name] = host_params()
            except Exception:
                pass
        del model  # last reference: XLA frees the HBM

    def unload_all(self):
        for name in list(self.loaded):
            self.unload_model(name)

    def evict_host_cache(self, name=None):
        if name is None:
            self._host_cache.clear()
        else:
            self._host_cache.pop(name, None)

    @staticmethod
    def _ram_headroom_ok(min_free_gb=4.0):
        try:
            import psutil

            return psutil.virtual_memory().available / (1024 ** 3) >= min_free_gb
        except Exception:
            return True

    def cache_stats(self):
        total = self.cache_hits + self.cache_misses
        return {
            "hits": self.cache_hits,
            "misses": self.cache_misses,
            "hit_rate": self.cache_hits / total if total else 0.0,
            "cached_models": sorted(self._host_cache),
        }

    # -------------------------------------------------------- pass planning

    def capacity_gb(self):
        """Usable budget: HBM - 1 GB headroom, or RAM - 2 GB in CPU mode."""
        if self.hbm_gb > 0:
            return max(1.0, self.hbm_gb - 1.0)
        return max(1.0, detect_ram_gb() - 2.0)

    def requirements(self, name):
        table = MODEL_HBM_REQUIREMENTS if self.hbm_gb > 0 else MODEL_RAM_REQUIREMENTS
        need = table.get(name, 1.0)
        if name == "vlm_tagger" and self.hbm_gb > 0:
            # the tagger tensor-shards its 7B decoder over 'tp' when several
            # chips are visible; the planner must budget the PER-CHIP share
            import jax

            from facet_tpu.models.qwen_text import QwenTextConfig
            from facet_tpu.parallel.tp import decoder_hbm_gb, pick_tp

            cfg = QwenTextConfig()
            tp = pick_tp(cfg, len(jax.devices()), self.hbm_gb)
            if tp is not None:
                # sharded decoder + replicated vision tower/activations
                need = decoder_hbm_gb(cfg, tp) + 2.5
        return need

    def group_passes(self, model_names, capacity_gb=None):
        """First-fit-decreasing bin packing of models into device passes."""
        capacity = capacity_gb if capacity_gb is not None else self.capacity_gb()
        ordered = sorted(model_names, key=self.requirements, reverse=True)
        passes, loads = [], []
        for name in ordered:
            need = self.requirements(name)
            placed = False
            for i, load in enumerate(loads):
                if load + need <= capacity:
                    passes[i].append(name)
                    loads[i] += need
                    placed = True
                    break
            if not placed:
                passes.append([name])
                loads.append(need)
        return passes

    # ----------------------------------------------------- selection policy

    def select_models(self, config=None):
        """Ensemble members for the configured profile (multi-pass default)."""
        config = config or self.config
        models = ["clip"]
        if config is not None:
            quality = QUALITY_MODEL_ALIASES.get(
                config.get_model_for_task("aesthetic"))
            if quality:
                models.append(quality)
            if config.is_using_samp_net():
                models.append("samp_net")
            tagging = config.get_model_for_task("tagging")
            if tagging == "qwen2.5-vl-7b":
                models.append("vlm_tagger")
            elif tagging == "qwen3-vl-2b":
                models.append("qwen3_vl_tagger")
        models.append("insightface")
        # keep only models we can actually build, preserving order
        return [m for m in dict.fromkeys(models) if m in self._factories]

    @staticmethod
    def list_available_models():
        """Rows for --list-models: (name, task, srcc, hbm_gb, description)."""
        rows = []
        for name, info in MODEL_INFO.items():
            rows.append((name, info["task"], info["srcc"],
                         MODEL_HBM_REQUIREMENTS.get(name), info["desc"]))
        return rows
