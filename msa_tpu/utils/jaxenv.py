"""JAX environment setup shared by CLI / bench / graft entry points.

Must be imported before jax initializes a backend. Enables the persistent
compilation cache (compiles are remote in the target environment, ~2s each)
and exposes helpers for device/mesh introspection.
"""

from __future__ import annotations

import os


def setup_jax_env(cache_dir: str = "/tmp/jax_cache_msa") -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


setup_jax_env()
