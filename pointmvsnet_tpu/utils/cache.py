"""Persistent XLA compilation cache.

Full-pipeline compiles cost 1–10 minutes through this host's remote TPU
compile service; caching executables on disk makes every entry point after
the first run start in seconds. Opt out with PMVS_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "") -> None:
    if os.environ.get("PMVS_NO_COMPILE_CACHE"):
        return
    import jax

    path = path or os.environ.get("PMVS_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/pmvs_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
