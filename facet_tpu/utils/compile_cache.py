"""Persistent XLA compilation cache, one switch for every entry point.

Round-5 discipline (docs/PERF.md): executables serialize/deserialize
through the axon PJRT plugin, so a warm cache turns the bench's ~80 s of
member compiles into ~0 s — but the XLA-level side caches jax enables
next to the dir (per-fusion autotune etc.) were observed to STALL
compiles through the relay for 25+ minutes, so only the executable cache
is enabled. bench.py, the on-chip probes, and any future tool call this
one helper instead of copy-pasting the three config lines (a fourth copy
had already drifted when the review caught it).

FACET_XLA_CACHE=off (or 0 / empty) disables; any other value overrides
the default repo-local `.cache/xla` directory.
"""

import os

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache", "xla")


def enable_persistent_cache(cache_dir=None):
    """Configure jax's executable cache. Returns the resolved directory,
    or None when disabled. Call after `import jax`, before first compile."""
    import jax

    cache_dir = cache_dir or os.environ.get("FACET_XLA_CACHE", DEFAULT_DIR)
    if cache_dir in ("off", "0", ""):
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    return cache_dir
