"""Test harness environment.

- Forces the CPU backend with 8 virtual devices so multi-chip sharding paths
  are exercised without TPU hardware (the session env pins
  ``JAX_PLATFORMS=axon`` — the TPU tunnel — which must be overridden here;
  the driver separately dry-runs ``__graft_entry__.dryrun_multichip``).
- Forces ``highest`` matmul precision: this image's default matmul precision
  is bf16-like even on CPU (~5e-2 error on a 3x3 matmul), which would make
  numerical assertions meaningless.
- Enables the persistent compilation cache: the box has ONE cpu core and
  XLA recompiles are the dominant test cost.

Must run before jax is imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (env above must be set first)

# sitecustomize (/root/.axon_site) imports jax at interpreter startup, which
# latches JAX_PLATFORMS=axon before this file runs — override via config.
jax.config.update("jax_platforms", "cpu")
# the env var spelling is not honored for this option in this jax version
jax.config.update("jax_default_matmul_precision", "highest")
