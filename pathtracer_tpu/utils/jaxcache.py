"""Persistent XLA compilation cache setup.

The TPU in this environment compiles through a remote service with highly
variable queueing latency (observed 10s-400s for identical programs), so
every entry point enables JAX's persistent compilation cache: recompiles of
unchanged programs become disk hits.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "PATHTRACER_TPU_CACHE", "/root/.cache/pathtracer_tpu_xla"
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
