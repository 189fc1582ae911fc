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

        # partition WITHOUT initializing the backend: jax.default_backend()
        # would eagerly create backends, and a later
        # jax.distributed.initialize() (multi-host run.py) then raises
        # "must be called before any JAX calls". The configured platform
        # list is a plain string read — first entry wins, matching what
        # default_backend() would resolve to in this environment.
        platforms = jax.config.jax_platforms or ""
        platform = platforms.split(",")[0].strip()
        if not platform:
            # platform unconfigured (autodetect): only query the backend if
            # one already exists — never be the call that initializes it
            try:
                from jax._src import xla_bridge

                already = xla_bridge.backends_are_initialized()
            except Exception:
                already = False
            platform = jax.default_backend() if already else "default"
        cache_dir = os.path.join(cache_dir, platform)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: caching is best-effort
