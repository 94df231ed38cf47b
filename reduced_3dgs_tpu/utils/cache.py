"""Persistent XLA compile cache setup.

Training runs re-jit whenever a static shape changes (capacity tiers as
densification grows the store, key-buffer tiers as the entry count moves).
The tiers keep the number of distinct shapes logarithmic, but each fresh
compile still costs 20-40 s on TPU (minutes on CPU); the persistent cache
makes every shape a one-time cost across steps AND across runs.
"""
from __future__ import annotations

import os


def enable_compile_cache(path: str = None) -> None:
    """Idempotent; call before the first jit compilation."""
    import jax
    path = path or os.environ.get("R3DGS_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/r3dgs_xla"))
    try:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass  # cache is an optimisation; never fail a run over it
