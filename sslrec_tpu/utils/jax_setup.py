"""Process-level JAX configuration: persistent compilation cache.

First-compile of the whole-epoch scan / evaluator programs is tens of seconds
(more over a remote-device tunnel); the persistent cache makes every subsequent
process start hit compiled artifacts.  Import-and-call from every entry point.
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SSLREC_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
    try:
        cache_dir = os.path.abspath(cache_dir)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimisation only
    _DONE = True
