"""Persistent XLA compilation cache (shared by all device kernels).

The DP programs are large (minutes of TPU compile time); the on-disk cache
makes warm starts instant across processes. Directory: $PRIBLAST_JAX_CACHE
or <repo>/.jax_cache.
"""

from __future__ import annotations

import os

_SET = False


def enable() -> None:
    global _SET
    if _SET:
        return
    _SET = True
    import jax

    try:
        cache_dir = os.environ.get(
            "PRIBLAST_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
