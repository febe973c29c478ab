"""Persistent XLA compilation cache setup.

The coverage/fusion kernel and Stage-1 programs are compiled once per shape
bucket; on tunneled TPU backends a compile can take minutes, so compiled
binaries are cached on disk and reused across processes.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        # Opt-in only: some experimental backends (tunneled TPUs with remote
        # compile) hang when a persistent compilation cache is configured.
        cache_dir = os.environ.get("INFIDEX_TPU_JAX_CACHE")
        if not cache_dir:
            return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is best-effort; never break engine startup
