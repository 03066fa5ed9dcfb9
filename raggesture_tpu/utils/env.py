"""Runtime environment helpers (compile cache, platform quirks)."""

from __future__ import annotations

import os


def pin_platform_from_env() -> None:
    """Make ``JAX_PLATFORMS`` selection effective via ``jax.config``.

    On hosts where a sitecustomize registers a remote-TPU PJRT plugin at
    interpreter start, backend discovery can still initialize (and dial)
    that plugin even when ``JAX_PLATFORMS=cpu`` is set in the
    environment — which hangs every CPU-only tool run whenever the
    remote tunnel is down.  Re-asserting the platform through
    ``jax.config.update`` right after ``import jax`` provably skips the
    foreign plugin init.  No-op when ``JAX_PLATFORMS`` is unset/empty
    (the default backend is then whatever the host configures).

    Call this at the top of every CLI entry point, before the first
    operation that initializes a backend (``jax.devices()``, ``jit``
    dispatch, ``jnp.asarray`` ...).
    """
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)


def setup_compilation_cache(path: str | None = None):
    """Enable the persistent XLA compilation cache.  On this rig every
    compile is a remote round-trip (PALLAS_AXON_REMOTE_COMPILE), so caching
    compiled executables across processes matters a lot.

    Also re-asserts ``JAX_PLATFORMS`` via :func:`pin_platform_from_env` —
    every CLI tool calls this helper first thing, which makes it the one
    place that guarantees platform selection happens before backend init.
    """
    pin_platform_from_env()
    import jax

    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
