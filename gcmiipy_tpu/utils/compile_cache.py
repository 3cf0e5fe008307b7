"""Persistent XLA compilation cache setup.

First compiles of the fused whole-step kernels go through the sandbox's
remote compile helper and can take tens of minutes; the persistent cache
makes every later process start-up near-instant.  Call
:func:`enable_compile_cache` before the first jit execution (importing jax
is fine, initializing the backend is fine too — the cache config is read
at compile time).
"""

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".cache", "xla_compile")


def enable_compile_cache(path=None, min_compile_secs=5.0):
    """Point jax at a persistent on-disk compilation cache."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
