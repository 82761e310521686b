"""Persistent XLA compilation cache.

Beam-search graphs at production size compile for minutes on first use;
the persistent cache makes every later process start instantly. Enabled by
every recipe main() (opt out with SATPU_NO_COMPILE_CACHE=1).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None):
    if os.environ.get("SATPU_NO_COMPILE_CACHE") == "1":
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SATPU_COMPILE_CACHE_DIR", os.path.expanduser("~/.cache/satpu_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax without the flags
