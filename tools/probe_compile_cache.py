"""Probe: does the persistent XLA compilation cache work on this chip?

Round-5 enabler (VERDICT item 1): if compiled executables serialize through
the axon PJRT plugin, driver bench reruns skip the ~83 s of member compiles
and the b384 fused member's 316 s cold compile amortizes to a one-time cost.

Run twice (two fresh processes): the first populates the cache, the second
should compile near-instantly. Prints one JSON line with the compile time
and the cache dir's entry count.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax

    from facet_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    if cache_dir is None:
        print("cache disabled (FACET_XLA_CACHE=off)", file=sys.stderr)
        return 1
    # probe wants even the tiny test program cached
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    import logging

    logging.basicConfig(level=logging.WARNING)
    for mod in ("jax._src.compilation_cache", "jax._src.compiler"):
        logging.getLogger(mod).setLevel(logging.DEBUG)
        logging.getLogger(mod).addHandler(logging.StreamHandler(sys.stderr))

    jax.devices()
    print("backend ready", flush=True, file=sys.stderr)
    t_ready = time.time()

    @jax.jit
    def f(x):
        # enough work to be cache-worthy but fast to compile cold
        for _ in range(8):
            x = jnp.tanh(x @ x) + 0.1
        return jnp.sum(x)

    x = jnp.ones((512, 512), jnp.float32)
    t0 = time.time()
    compiled = f.lower(x).compile()
    t_compile = time.time() - t0
    print(f"compile {t_compile:.1f}s", flush=True, file=sys.stderr)
    y = float(compiled(x))
    dt = time.time() - t_ready
    print(f"compiled+ran in {dt:.1f}s (compile {t_compile:.1f}s)",
          flush=True, file=sys.stderr)
    entries = [e for e in os.listdir(cache_dir)]
    print(json.dumps({"compile_plus_run_s": round(dt, 2), "value": y,
                      "cache_entries": len(entries)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
