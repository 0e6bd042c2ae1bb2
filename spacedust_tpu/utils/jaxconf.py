"""Process-wide JAX configuration for spacedust_tpu.

- Persistent compilation cache: the engine compiles one kernel per
  (length-bucket, direction) shape; caching them on disk makes repeat
  runs start hot (the reference has no compile step to amortize, so this
  is required to compete on end-to-end wall-clock).
- Platform override: SPACEDUST_JAX_PLATFORM forces a backend (tests use
  cpu with a virtual 8-device mesh).
"""

from __future__ import annotations

import os

_DONE = False


def configure_jax() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    if os.environ.get("SPACEDUST_JAX_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SPACEDUST_JAX_PLATFORM"])
    if not os.environ.get("SPACEDUST_NO_COMPILE_CACHE"):
        cache = os.environ.get(
            "SPACEDUST_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "spacedust_tpu",
                         "jax_cache"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
