"""Runtime environment helpers (compile cache, platform quirks)."""

from __future__ import annotations

import os


def setup_compilation_cache(path: str | None = None):
    """Enable the persistent XLA compilation cache.  On this rig every
    compile is a remote round-trip (PALLAS_AXON_REMOTE_COMPILE), so caching
    compiled executables across processes matters a lot."""
    import jax

    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
