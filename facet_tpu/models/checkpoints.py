"""Checkpoint resolution: converted weights when present, deterministic
random init otherwise.

Real deployments run tools/convert_checkpoints.py once to convert public
torch/ONNX releases into pretrained_models/*.npz; offline/dev environments
fall back to seeded random params so every pipeline stays runnable (scores
are then placeholders — a loud warning says so).
"""

import os
import warnings

import jax
import jax.numpy as jnp

PRETRAINED_DIR = os.environ.get("FACET_PRETRAINED_DIR", "pretrained_models")

_warned = set()


def _warn_once(name):
    if name not in _warned:
        _warned.add(name)
        warnings.warn(
            f"no converted checkpoint for '{name}' under {PRETRAINED_DIR}/ — "
            f"using deterministic random init (scores will not be meaningful; "
            f"run tools/convert_checkpoints.py to install real weights)")


def checkpoint_path(name):
    return os.path.join(PRETRAINED_DIR, f"{name}.npz")


def load_or_none(name):
    from facet_tpu.models.convert import load_params

    path = checkpoint_path(name)
    if os.path.exists(path):
        return load_params(path)
    return None


def load_landmark_graph():
    """Exact 2d106det: a serialized ONNX graph (models/onnx_exec.py) written
    by tools/convert_insightface.py, executed directly on device."""
    path = checkpoint_path("landmark_106_graph")
    if os.path.exists(path):
        from facet_tpu.models.onnx_exec import load_graph

        return load_graph(path)
    return None


def clip_vision_config_from(clip_settings):
    """CLIPVisionConfig from the scoring config's models.clip.architecture
    block (absent keys -> ViT-L/14 defaults; tests use tiny overrides)."""
    from facet_tpu.models.clip import CLIPVisionConfig

    arch = (clip_settings or {}).get("architecture") or {}
    defaults = CLIPVisionConfig()
    return CLIPVisionConfig(
        image_size=arch.get("image_size", defaults.image_size),
        patch_size=arch.get("patch_size", defaults.patch_size),
        width=arch.get("width", defaults.width),
        layers=arch.get("layers", defaults.layers),
        heads=arch.get("heads", defaults.heads),
        projection_dim=arch.get("projection_dim", defaults.projection_dim),
    )


def load_clip_vision_params(host_cached=None, config=None):
    """-> (vision_params, head_params), from host cache > disk > random."""
    from facet_tpu.models.aesthetic import AestheticHead
    from facet_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower

    if host_cached is not None:
        return host_cached["vision"], host_cached["head"]

    config = config or CLIPVisionConfig()
    vision = load_or_none("clip_vit_l14_vision")
    head = load_or_none("aesthetic_head")
    if vision is None:
        _warn_once("clip_vit_l14_vision")
        model = CLIPVisionTower(config)
        vision = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, config.image_size, config.image_size, 3),
                                      jnp.float32))
    if head is None:
        _warn_once("aesthetic_head")
        head = AestheticHead().init(
            jax.random.PRNGKey(1), jnp.zeros((1, config.projection_dim), jnp.float32))
    return vision, head
