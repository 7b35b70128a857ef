"""Persistent XLA compilation cache location.

The pairing programs take minutes (worst case ~20 min) to compile cold;
the persistent cache makes warm restarts take seconds. The cache lives
INSIDE the repo (gitignored `.jax_cache/`) rather than /tmp because the
repo directory survives container restarts while /tmp does not — a /tmp
cache silently re-pays the full cold compile on every fresh session.

Override with BN254_CACHE_DIR (e.g. point it at a shared NFS cache).
"""

from __future__ import annotations

import os

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def cache_dir() -> str:
    return os.environ.get(
        "BN254_CACHE_DIR", os.path.join(_REPO, ".jax_cache")
    )


def enable() -> str:
    """Point jax at the persistent cache; returns the directory used."""
    import jax

    d = cache_dir()
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d
