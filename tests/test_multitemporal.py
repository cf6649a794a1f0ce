"""Multi-temporal (T>1) pipeline tests: grouped frames -> (B,T,H,W,C) batches."""

import numpy as np

from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig
from s2tpu.data.dataset import TiffSource, make_synthetic_fixture
from s2tpu.data.pipeline import Datamodule


def test_multitemporal_source(tmp_path):
    make_synthetic_fixture(tmp_path, aoi="vie", label_map="osm-multiclass", n_segments=3, n_time=4, size=(48, 48))
    src = TiffSource("vie", "osm-multiclass", data_dir=tmp_path, n_time_frames=3)
    assert len(src) == 3  # 3 segments, each with >= 3 frames
    s = src[0]
    assert s.x.shape == (3, 48, 48, 6)
    assert s.y.shape == (48, 48)
    assert src.label_index_for(0) == 0


def test_multitemporal_batches(tmp_path):
    make_synthetic_fixture(tmp_path, aoi="vie", label_map="osm-multiclass", n_segments=4, n_time=2, size=(48, 48))
    cfg = DatamoduleConfig(
        dataset_cfg=DatasetConfig(
            aoi="vie", label_map="osm-multiclass", data_dir=str(tmp_path), n_time_frames=2
        ),
        batch_size=2,
        data_split=(1.0, 0.0, 0.0),
        random_crop_size=32,
    )
    dm = Datamodule(cfg)
    batch = next(iter(dm.train_batches(epoch=0)))
    assert batch.images.shape == (2, 2, 32, 32, 6)
    assert batch.labels.shape == (2, 32, 32)


def test_multitemporal_flips_consistent():
    import jax
    import jax.numpy as jnp

    from s2tpu.data.augment import random_flips

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 3, 8, 8, 2)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, size=(4, 8, 8)).astype(np.int32))
    fx, fy = random_flips(x, y, jax.random.key(1), p_horizontal=1.0, p_vertical=0.0)
    # horizontal flip reverses W on all frames and labels
    np.testing.assert_array_equal(np.asarray(fx), np.asarray(x)[..., :, ::-1, :])
    np.testing.assert_array_equal(np.asarray(fy), np.asarray(y)[..., :, ::-1])


def test_single_frame_flips_unchanged_semantics():
    import jax
    import jax.numpy as jnp

    from s2tpu.data.augment import random_flips

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 2)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, size=(3, 8, 8)).astype(np.int32))
    fx, fy = random_flips(x, y, jax.random.key(1), p_horizontal=0.0, p_vertical=1.0)
    np.testing.assert_array_equal(np.asarray(fx), np.asarray(x)[:, ::-1])
    np.testing.assert_array_equal(np.asarray(fy), np.asarray(y)[:, ::-1])
