"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no TPU required) so that the
multi-chip sharding paths are exercised in CI, per SURVEY.md §4. The env
vars must be set before JAX is imported anywhere.
"""

import os
import sys

# Force CPU even if the environment preselects a TPU platform: the test
# suite targets the virtual 8-device CPU mesh, never the real chip.
# NB the env var alone is not enough when a sitecustomize has already
# imported jax (its config snapshots JAX_PLATFORMS at import); the
# in-process config update below is authoritative pre-backend-init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jcache.enable() DISABLES the persistent compilation cache on the CPU
# backend (deserializing persisted XLA:CPU executables segfaulted test
# sessions — see utils/jcache.py); tests rely on jax's in-memory cache.
import jax

jax.config.update("jax_platforms", "cpu")
from bn254_tpu.utils.jcache import enable as _enable_jax_cache
_enable_jax_cache()
