"""JAX runtime setup helpers.

The container's sitecustomize imports jax at interpreter start (axon TPU
plugin), so env-var-based config (JAX_COMPILATION_CACHE_DIR, JAX_PLATFORMS)
set later in-process is ignored. These helpers use config.update, which
works at any time before backend initialization.
"""

from __future__ import annotations

import os


def setup_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def force_platform(platform: str | None) -> None:
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)
