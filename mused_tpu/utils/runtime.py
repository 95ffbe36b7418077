"""Runtime setup helpers shared by the CLI, bench, and driver entry points."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — first compiles over the remote TPU
    tunnel take minutes; the cache makes every later process start warm."""
    import jax
    path = path or os.environ.get(
        "MUSED_TPU_CACHE", os.path.expanduser("~/.cache/mused_tpu_jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:     # cache is an optimization, never a requirement
        pass
