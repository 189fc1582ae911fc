"""Persistent XLA compilation cache setup.

First compiles over the remote tunnel cost 15-40s; caching them on disk makes
every subsequent process start warm. Call once early (run.py / bench.py do).

The cache directory is partitioned by backend platform: TPU-session compiles
can happen on a REMOTE compile service whose host CPU supports different
instruction-set features, and an AOT XLA:CPU executable written by such a
process SIGILLs when a local CPU-only process loads it from a shared cache.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = "/tmp/yanerf_xla_cache") -> None:
    try:
        import jax

        platform = jax.default_backend()
        cache_dir = os.path.join(cache_dir, platform)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: caching is best-effort
