"""Acquisition orchestration + rasterization + CLI-surface tests (offline)."""

import numpy as np
import pytest

from s2tpu.configs.data_config import AOIs, SEGMENT_LENGTH_KM, BBox, DataDirs
from s2tpu.geo.acquisition import (
    LabelQualityWarning,
    download_labels,
    download_sentinel,
    split_time_interval,
)
from s2tpu.geo.grid import calculate_segments
from s2tpu.geo.rasterize import lonlat_to_pixel, rasterize_geometries, unlabeled_fraction

SEGMENTS = calculate_segments(AOIs["small"], SEGMENT_LENGTH_KM)  # 6 segments


def test_split_time_interval():
    qs = split_time_interval(("2020-01-01", "2021-01-01"), "QS")
    assert len(qs) == 4
    assert qs[0] == ("2020-01-01", "2020-04-01")
    assert qs[-1] == ("2020-10-01", "2021-01-01")
    ms = split_time_interval(("2020-01-01", "2020-04-01"), "MS")
    assert len(ms) == 3


def test_download_sentinel_offline(tmp_path):
    calls = []

    def fake_fetch(segment, interval):
        calls.append((segment, interval))
        rng = np.random.default_rng(len(calls))
        frame = rng.integers(1, 4000, size=(64, 64, 6)).astype(np.int16)
        if len(calls) % 5 == 0:
            frame[:] = 0  # cut-off frame -> must be dropped
        return frame

    import s2tpu.configs.data_config as dc
    orig = dc.SEGMENT_SIZE
    n = download_sentinel(
        "small", fake_fetch, frequency="QS", workers=2, data_dir=tmp_path, segments=SEGMENTS
    )
    # 6 segments x 4 intervals = 24 fetches, ~1/5 dropped
    assert len(calls) == 24
    dd = DataDirs("small", "", data_dir=tmp_path)
    files = dd.sentinel_files
    assert n == len(files) > 0
    # naming contract <segment>_<timeidx>.tif with consecutive time indices
    stems = sorted(f.stem for f in files.values())
    assert all("_" in s for s in stems)
    assert (dd.base_path / "metadata.json").exists()
    assert not (dd.base_path / "resume.json").exists()


def test_download_sentinel_resume(tmp_path):
    count = [0]

    def fake_fetch(segment, interval):
        count[0] += 1
        return np.ones((32, 32, 6), np.int16)

    download_sentinel("small", fake_fetch, frequency="QS", data_dir=tmp_path, segments=SEGMENTS)
    first = count[0]
    # metadata.json exists; resume with same metadata re-fetches everything
    # only for segments not in resume.json (which was finalized -> all refetch)
    download_sentinel(
        "small", fake_fetch, frequency="QS", data_dir=tmp_path, segments=SEGMENTS, resume=True
    )
    assert count[0] == 2 * first


def test_download_labels_quality_gate(tmp_path):
    def sparse_fetch(segment):
        r = np.zeros((64, 64), np.uint8)
        r[:2, :2] = 1  # mostly unlabeled
        return r

    with pytest.warns(LabelQualityWarning):
        n = download_labels(
            "small", "osm-multiclass", sparse_fetch, data_dir=tmp_path, segments=SEGMENTS
        )
    assert n == 0  # all segments failed the multiclass gate

    # binary maps save regardless (reference net behavior)
    n2 = download_labels(
        "small", "osm-nature-binary", sparse_fetch, data_dir=tmp_path, segments=SEGMENTS
    )
    assert n2 == 6


def test_download_labels_good_data(tmp_path):
    def dense_fetch(segment):
        rng = np.random.default_rng(0)
        return rng.integers(1, 4, size=(64, 64)).astype(np.uint8)

    n = download_labels("small", "osm-multiclass", dense_fetch, data_dir=tmp_path, segments=SEGMENTS)
    assert n == 6
    dd = DataDirs("small", "osm-multiclass", data_dir=tmp_path)
    assert sorted(dd.label_files) == list(range(6))


def test_lonlat_to_pixel():
    bbox = BBox(north=10.0, south=0.0, east=20.0, west=0.0)
    px = lonlat_to_pixel(np.array([[0.0, 10.0], [20.0, 0.0], [10.0, 5.0]]), bbox, (100, 200))
    np.testing.assert_allclose(px, [[0, 0], [200, 100], [100, 50]])


def test_rasterize_polygon_priority():
    bbox = BBox(north=1.0, south=0.0, east=1.0, west=0.0)
    square = lambda w, s, e, n: {  # noqa: E731
        "type": "Polygon",
        "coordinates": [[(w, s), (e, s), (e, n), (w, n), (w, s)]],
    }
    # class 1 covers left half, class 2 covers center — later class wins overlap
    out = rasterize_geometries(
        [square(0.0, 0.0, 0.5, 1.0), square(0.25, 0.25, 0.75, 0.75)],
        [1, 2],
        bbox,
        shape=(64, 64),
    )
    assert out[32, 10] == 1  # left strip
    assert out[32, 32] == 2  # center overlap -> class 2
    assert out[32, 60] == 0  # right background
    assert unlabeled_fraction(out) > 0.3


def test_rasterize_polygon_with_hole():
    bbox = BBox(north=1.0, south=0.0, east=1.0, west=0.0)
    donut = {
        "type": "Polygon",
        "coordinates": [
            [(0.1, 0.1), (0.9, 0.1), (0.9, 0.9), (0.1, 0.9), (0.1, 0.1)],
            [(0.4, 0.4), (0.6, 0.4), (0.6, 0.6), (0.4, 0.6), (0.4, 0.4)],
        ],
    }
    out = rasterize_geometries([donut], [3], bbox, shape=(100, 100))
    assert out[50, 20] == 3  # ring body
    assert out[50, 50] == 0  # hole


def test_rasterize_line_and_point():
    bbox = BBox(north=1.0, south=0.0, east=1.0, west=0.0)
    line = {"type": "LineString", "coordinates": [(0.0, 0.5), (1.0, 0.5)]}
    point = {"type": "Point", "coordinates": (0.25, 0.25)}
    out = rasterize_geometries([line, point], [1, 2], bbox, shape=(64, 64))
    assert (out[32, :] == 1).any()
    assert out[48, 16] == 2


def test_cli_parsers_accept_reference_surface():
    """The CLI surface accepts the reference's call patterns (README.md:27-49)."""
    from s2tpu.cli.train_segmentation import build_parser, config_from_args

    args = build_parser().parse_args(
        ["at", "osm-multiclass", "efficientnet-unet-b5", "--type", "overfit", "--bs", "4",
         "--loss-type", "focal", "--weighted-loss", "--tags", "t1", "t2", "--wandb"]
    )
    cfg = config_from_args(args)
    assert cfg.datamodule.batch_size == 4
    assert cfg.train.loss_type.value == "focal"
    assert cfg.train.overfit_batches == 1
    assert cfg.train.use_wandb_logger is False
    assert "t1" in cfg.train.tags and cfg.num_classes == 4

    from s2tpu.cli.train_mae import build_parser as mae_parser, config_from_args as mae_cfg_fn

    margs = mae_parser().parse_args(["at", "--type", "pretrain", "--num-devices", "4"])
    mcfg = mae_cfg_fn(margs)
    assert mcfg.train.from_scratch is True
    assert mcfg.datamodule.batch_size == 64
    # effective_bs is the GLOBAL batch — --num-devices must not multiply
    # into the LR rule (configs/mae.py module docstring).
    np.testing.assert_allclose(mcfg.train.lr, 1.5e-4 * 64 / 256)

    from s2tpu.cli.download_sentinel import main as ds_main
    from s2tpu.cli.download_labels import main as dl_main

    with pytest.raises(SystemExit):
        ds_main(["not-an-aoi"])
    with pytest.raises(SystemExit):
        dl_main(["at", "bogus-map"])
