"""Neural model ensemble, implemented natively in JAX/flax.

Members (reference wrappers in models/ of the upstream project):
- CLIP ViT-L/14 vision + text towers (clip.py) with the aesthetic MLP head
  (aesthetic.py) — the 'clip-mlp' legacy aesthetic model.
- Zero-shot CLIP tagger (tagger.py) over the config vocabulary.
- SAMP-Net + U2-Net-P composition models (samp_net.py).
- TOPIQ NR-IQA (topiq.py) + CLIP-IQA+/HyperIQA/DBCNN/MUSIQ (iqa*.py).
- Exact SCRFD det_10g detector (scrfd.py), 106-pt landmarks — the real
  2d106det graph executes directly via onnx_exec.py — and exact ArcFace
  iResNet-50 embeddings (face_models.py).
- Qwen2.5-VL and Qwen3-VL vision towers + text decoders
  (qwen_vision/qwen_text/qwen3_vision/qwen3_text.py) for all-TPU tagging.
- ModelManager (model_manager.py): load/unload lifecycle, HBM bin-packing of
  ensemble passes, host-RAM parameter caching.

Checkpoints convert from public torch/ONNX releases via convert.py; in
offline environments every model falls back to deterministic random init so
pipelines stay runnable end-to-end.
"""

from facet_tpu.models.clip import CLIPVisionConfig, CLIPTextConfig, CLIPVisionTower, CLIPTextTower
from facet_tpu.models.aesthetic import AestheticScorer
from facet_tpu.models.tagger import CLIPTagger

__all__ = [
    "CLIPVisionConfig",
    "CLIPTextConfig",
    "CLIPVisionTower",
    "CLIPTextTower",
    "AestheticScorer",
    "CLIPTagger",
]
