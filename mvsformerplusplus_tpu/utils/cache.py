"""Persistent XLA compilation cache (saves minutes per process on the
remote-compile TPU relay; harmless elsewhere). Call once at startup."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.jax_cache") -> None:
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax or read-only fs: skip silently
