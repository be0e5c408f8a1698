"""Checkpoint resolution: converted weights when present, deterministic
random init otherwise.

Real deployments run tools/convert_checkpoints.py once to convert public
torch/ONNX releases into pretrained_models/*.npz; offline/dev environments
fall back to seeded random params so every pipeline stays runnable (scores
are then placeholders — a loud warning says so).
"""

import math
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

PRETRAINED_DIR = os.environ.get("FACET_PRETRAINED_DIR", "pretrained_models")

_warned = set()


def _warn_once(name):
    if name not in _warned:
        _warned.add(name)
        warnings.warn(
            f"no converted checkpoint for '{name}' under {PRETRAINED_DIR}/ — "
            f"using deterministic random init (scores will not be meaningful; "
            f"run tools/convert_checkpoints.py to install real weights)")


def sds(shape, dtype=jnp.float32):
    """Shorthand for a ShapeDtypeStruct example arg to fallback_init."""
    return jax.ShapeDtypeStruct(shape, dtype)


def fallback_init(module, *example_args, seed=0):
    """Deterministic fallback params WITHOUT running flax init on device.

    Eager ``module.init`` dispatches one device call per parameter (~1500
    sequential RPC round-trips for a ViT-L on a relayed chip — minutes of
    wall-clock), and jitting the whole threefry init program compiles
    pathologically on this TPU (docs/PERF.md probe notes). Instead the
    parameter SHAPES come from jax.eval_shape (pure tracing, no device
    work) and the VALUES from one compiled fill program: >=2-D kernels get
    centered fan-in-scaled pseudo-randoms from an integer hash, 1-D
    'scale'/variance leaves get ones, everything else zeros — same
    magnitude profile as lecun-normal init, one device call total.
    Example args may be arrays or ShapeDtypeStructs (see ``sds``).
    """
    key = jax.random.PRNGKey(seed)
    args = jax.tree_util.tree_map(
        lambda a: a if isinstance(a, jax.ShapeDtypeStruct)
        else jax.ShapeDtypeStruct(jnp.shape(a), a.dtype),
        list(example_args),
        is_leaf=lambda a: isinstance(a, jax.ShapeDtypeStruct))
    shapes = jax.eval_shape(lambda *xs: module.init(key, *xs), *args)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def leaf_name(path):
        last = path[-1]
        return str(getattr(last, "key", getattr(last, "name", last)))

    @jax.jit
    def _fill():
        out = []
        for i, (path, s) in enumerate(flat):
            if not jnp.issubdtype(s.dtype, jnp.floating):
                out.append(jnp.zeros(s.shape, s.dtype))
            elif len(s.shape) >= 2:
                n = int(np.prod(s.shape))
                fan_in = int(np.prod(s.shape[:-1]))
                scale = 1.0 / math.sqrt(max(1, fan_in))
                x = (jnp.arange(n, dtype=jnp.uint32)
                     * np.uint32(2654435761)
                     + np.uint32((0x9E3779B9 * (i + 1) + seed) & 0xFFFFFFFF))
                u = (x >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
                out.append(((u - 0.5) * (2.0 * scale))
                           .reshape(s.shape).astype(s.dtype))
            elif leaf_name(path) in ("scale", "var", "running_var"):
                out.append(jnp.ones(s.shape, s.dtype))
            else:
                out.append(jnp.zeros(s.shape, s.dtype))
        return out

    return jax.tree_util.tree_unflatten(treedef, _fill())


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
        vision = fallback_init(
            model, sds((1, config.image_size, config.image_size, 3)), seed=0)
    if head is None:
        _warn_once("aesthetic_head")
        head = fallback_init(
            AestheticHead(), sds((1, config.projection_dim)), seed=1)
    return vision, head
