"""Test harness: 8-device virtual CPU mesh, no TPU.

All tests run on CPU with 8 virtual devices so data/model-parallel paths are
exercised without TPU hardware (SURVEY.md §4 test strategy).

The container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (a remote-TPU plugin) already in the environment, so env
mutation here is too late — the platform must be switched via
``jax.config.update`` before any backend initializes. XLA_FLAGS still works
because the CPU client itself comes up lazily on first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: repeated suite runs skip XLA recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/s2tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"
assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.device_count()}"


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Synthetic multiclass AOI following the real on-disk contract."""
    from s2tpu.data.dataset import make_synthetic_fixture

    root = tmp_path_factory.mktemp("data")
    make_synthetic_fixture(root, aoi="small", label_map="osm-multiclass", n_segments=6, size=(96, 96))
    return root


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
