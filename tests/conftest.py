"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

All tests run on CPU with 8 virtual devices so data/model-parallel paths are
exercised without TPU hardware (SURVEY.md §4 test strategy).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


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
