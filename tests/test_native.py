"""Native gather library: build, correctness vs numpy, pipeline integration."""

import numpy as np
import pytest

from s2tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_gather_matches_numpy(lib, rng):
    images = rng.integers(-2000, 4000, size=(10, 48, 52, 6)).astype(np.int16)
    labels = rng.integers(0, 5, size=(10, 48, 52)).astype(np.uint8)
    indices = np.array([3, 0, 9, 3])
    ys = np.array([0, 5, 16, 1])
    xs = np.array([2, 0, 20, 7])
    crop = 32
    out, lout = native.gather_crops(images, labels, indices, ys, xs, crop)
    assert out.shape == (4, 32, 32, 6) and out.dtype == np.int16
    assert lout.shape == (4, 32, 32) and lout.dtype == np.int32
    for k in range(4):
        i, y0, x0 = indices[k], ys[k], xs[k]
        np.testing.assert_array_equal(out[k], images[i, y0 : y0 + crop, x0 : x0 + crop])
        np.testing.assert_array_equal(lout[k], labels[i, y0 : y0 + crop, x0 : x0 + crop])


def test_native_gather_single_thread(lib, rng):
    images = rng.integers(0, 100, size=(3, 16, 16, 2)).astype(np.int16)
    labels = rng.integers(0, 3, size=(3, 16, 16)).astype(np.uint8)
    out, lout = native.gather_crops(
        images, labels, np.array([1, 2]), np.array([0, 4]), np.array([0, 4]), 8, num_threads=1
    )
    np.testing.assert_array_equal(out[1], images[2, 4:12, 4:12])


def test_native_gather_flips_match_numpy(lib, rng):
    images = rng.integers(-2000, 4000, size=(6, 40, 44, 6)).astype(np.int16)
    labels = rng.integers(0, 5, size=(6, 40, 44)).astype(np.uint8)
    indices = np.array([0, 2, 5, 1])
    ys = np.array([1, 0, 8, 3])
    xs = np.array([0, 4, 10, 2])
    flip_h = np.array([1, 0, 1, 0], np.uint8)
    flip_v = np.array([0, 1, 1, 0], np.uint8)
    crop = 24
    out, lout = native.gather_crops(
        images, labels, indices, ys, xs, crop, flip_h=flip_h, flip_v=flip_v
    )
    for k in range(4):
        i, y0, x0 = indices[k], ys[k], xs[k]
        img = images[i, y0 : y0 + crop, x0 : x0 + crop]
        lbl = labels[i, y0 : y0 + crop, x0 : x0 + crop].astype(np.int32)
        if flip_h[k]:
            img, lbl = img[:, ::-1], lbl[:, ::-1]
        if flip_v[k]:
            img, lbl = img[::-1], lbl[::-1]
        np.testing.assert_array_equal(out[k], img)
        np.testing.assert_array_equal(lout[k], lbl)


def test_native_gather_rejects_bad_dtype(lib, rng):
    images = rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
    labels = np.zeros((2, 8, 8), np.uint8)
    assert native.gather_crops(images, labels, np.array([0]), np.array([0]), np.array([0]), 4) is None


def test_pipeline_uses_native_for_packed(fixture_dir, tmp_path):
    from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig
    from s2tpu.data.dataset import TiffSource, pack_dataset
    from s2tpu.data.pipeline import Datamodule

    src = TiffSource("small", "osm-multiclass", data_dir=fixture_dir)
    packed = pack_dataset(src, tmp_path / "packed")
    cfg = DatamoduleConfig(
        dataset_cfg=DatasetConfig(aoi="small", label_map="osm-multiclass"),
        batch_size=2,
        data_split=(1.0, 0.0, 0.0),
        random_crop_size=64,
    )
    dm = Datamodule(cfg, source=packed)
    batch = next(iter(dm.train_batches(epoch=0)))
    assert batch.images.shape == (2, 64, 64, 6)
    # content equals the numpy path over the same data — including the
    # host-side flips both paths draw from the same epoch rng
    dm_np = Datamodule(cfg, source=src)
    batch_np = next(iter(dm_np.train_batches(epoch=0)))
    np.testing.assert_array_equal(batch.images, batch_np.images)
    np.testing.assert_array_equal(batch.labels, batch_np.labels)


def test_host_flips_actually_flip(fixture_dir):
    from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig
    from s2tpu.data.dataset import TiffSource
    from s2tpu.data.pipeline import Datamodule

    src = TiffSource("small", "osm-multiclass", data_dir=fixture_dir)
    base = dict(
        dataset_cfg=DatasetConfig(aoi="small", label_map="osm-multiclass"),
        batch_size=4,
        data_split=(1.0, 0.0, 0.0),
        random_crop_size=64,
    )
    flipped = Datamodule(DatamoduleConfig(**base, host_flips=True), source=src)
    plain = Datamodule(DatamoduleConfig(**base, host_flips=False, random_horizontal_flip_p=0.0,
                                        random_vertical_flip_p=0.0), source=src)
    # identical crop rng draws (flip draws come after crop draws per batch)
    b_f = next(iter(flipped.train_batches(epoch=0)))
    b_p = next(iter(plain.train_batches(epoch=0)))
    # with p=0.5 over 4 samples the chance all 8 coin flips are "no" is 0.4%;
    # seed 0 is fixed so this is deterministic — assert at least one flip
    assert not np.array_equal(b_f.images, b_p.images)
    # every flipped sample must be one of the 4 flip variants of the plain one
    for k in range(4):
        variants = [
            b_p.images[k], b_p.images[k][:, ::-1], b_p.images[k][::-1], b_p.images[k][::-1, ::-1]
        ]
        assert any(np.array_equal(b_f.images[k], v) for v in variants)
