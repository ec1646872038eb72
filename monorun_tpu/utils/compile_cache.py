"""Persistent XLA compilation cache setup.

The full inference pipeline with frozen bf16 weights takes minutes to
compile (the remote-TPU tunnel adds upload time on top of XLA itself);
the persistent cache cuts warm process starts to milliseconds. Verified
to work through the axon remote-compile path. Call before the first jit
dispatch — entry-point scripts (tools/, bench.py, demo/) do this at
startup; library code never mutates global jax config itself.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/jax")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    path = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
