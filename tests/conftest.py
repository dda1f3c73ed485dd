"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding is validated the TPU-native way — on a virtual CPU mesh
(`xla_force_host_platform_device_count`), replacing the reference's
real-cluster-only Slurm testing (SURVEY.md §4).
"""

import os

# Overwrite (not setdefault): the environment pre-sets JAX_PLATFORMS to the
# TPU backend and a sitecustomize imports jax at interpreter start, freezing
# the env-derived config defaults. Both the env var and the live config must
# be forced back to CPU before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: compiles go through a remote service in this
# environment (~2s each), so caching them across runs keeps CI fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_msa")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib

import pytest

DATA = pathlib.Path(__file__).resolve().parent.parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA
