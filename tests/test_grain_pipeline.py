"""Grain-backed input pipeline: determinism + parity with the HostBatch contract."""

import numpy as np
import pytest

from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig
from s2tpu.data.dataset import TiffSource
from s2tpu.data.grain_pipeline import grain_available, grain_train_batches

pytestmark = pytest.mark.skipif(not grain_available(), reason="grain not installed")


@pytest.fixture()
def setup(fixture_dir):
    src = TiffSource("small", "osm-multiclass", data_dir=fixture_dir)
    cfg = DatamoduleConfig(
        dataset_cfg=DatasetConfig(aoi="small", label_map="osm-multiclass"),
        batch_size=2,
        data_split=(1.0, 0.0, 0.0),
        random_crop_size=64,
    )
    return src, cfg


def test_grain_batches_contract(setup):
    src, cfg = setup
    batches = list(grain_train_batches(src, np.arange(6), cfg, epoch=0))
    assert len(batches) == 3  # drop-last at bs=2 over 6 samples
    b = batches[0]
    assert b.images.shape == (2, 64, 64, 6) and b.images.dtype == np.int16
    assert b.labels.shape == (2, 64, 64) and b.labels.dtype == np.int32
    assert b.mask.all()


def test_grain_deterministic_and_reshuffles(setup):
    src, cfg = setup
    a = list(grain_train_batches(src, np.arange(6), cfg, epoch=0))
    b = list(grain_train_batches(src, np.arange(6), cfg, epoch=0))
    c = list(grain_train_batches(src, np.arange(6), cfg, epoch=1))
    assert all(np.array_equal(x.images, y.images) for x, y in zip(a, b))
    assert any(not np.array_equal(x.images, y.images) for x, y in zip(a, c))


@pytest.mark.slow
def test_grain_multiprocess_matches_inprocess(setup):
    src, cfg = setup
    a = list(grain_train_batches(src, np.arange(6), cfg, epoch=0))
    b = list(grain_train_batches(src, np.arange(6), cfg, epoch=0, worker_count=2))
    assert all(np.array_equal(x.images, y.images) for x, y in zip(a, b))
    assert all(np.array_equal(x.labels, y.labels) for x, y in zip(a, b))
