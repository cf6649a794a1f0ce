"""GeoTIFF codec + segment-grid tests."""

import numpy as np
import pytest

from s2tpu.configs.data_config import AOIs, SEGMENT_LENGTH_KM, BBox
from s2tpu.geo.grid import calculate_segments, geodesic_km, pixel_size
from s2tpu.geo.resume import ResumeState
from s2tpu.geo.tiff import GeoInfo, read_geotiff, write_geotiff


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16, np.float32])
@pytest.mark.parametrize("compress", [False, True])
def test_tiff_roundtrip(tmp_path, dtype, compress):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(size=(6, 64, 48)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        data = rng.integers(info.min, info.max, size=(6, 64, 48)).astype(dtype)
    geo = GeoInfo(west=15.1, north=48.3, pixel_size_x=1e-4, pixel_size_y=2e-4)
    path = tmp_path / "t.tif"
    write_geotiff(path, data, geo=geo, compress=compress)
    out, geo2 = read_geotiff(path)
    np.testing.assert_array_equal(out, data)
    assert out.dtype == dtype
    assert geo2.west == geo.west and geo2.north == geo.north
    np.testing.assert_allclose([geo2.pixel_size_x, geo2.pixel_size_y], [1e-4, 2e-4])
    assert geo2.epsg == 4326


def test_tiff_single_band(tmp_path):
    data = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
    path = tmp_path / "lbl.tif"
    write_geotiff(path, data)
    out, geo = read_geotiff(path)
    np.testing.assert_array_equal(out[0], data)
    assert geo is None


def test_geodesic_known_distances():
    # Vienna -> Munich is ~355 km; equator degree is ~111.32 km.
    d = geodesic_km(48.2082, 16.3738, 48.1351, 11.5820)
    assert 350 < d < 360
    deg = geodesic_km(0.0, 0.0, 0.0, 1.0)
    assert abs(deg - 111.32) < 0.05
    assert geodesic_km(10, 20, 10, 20) == 0.0


def test_segment_grid_geometry():
    bbox = AOIs["small"]
    segments = calculate_segments(bbox, SEGMENT_LENGTH_KM)
    # "small" is ~11.2 x 10.1 km -> 3x2 grid = 6 segments (data_config.py:63)
    assert len(segments) == 6
    # tiling covers the bbox exactly
    assert min(s.west for s in segments) == bbox.west
    assert max(s.north for s in segments) == pytest.approx(bbox.north)
    # lon-major ascending order (file-naming contract)
    assert segments[0].west == bbox.west and segments[0].south == bbox.south
    assert segments[1].south > segments[0].south
    # ceil-division grid: segments are at most SEGMENT_LENGTH_KM on a side
    w_km = geodesic_km(segments[0].north, segments[0].west, segments[0].north, segments[0].east)
    h_km = geodesic_km(segments[0].north, segments[0].west, segments[0].south, segments[0].west)
    assert w_km <= SEGMENT_LENGTH_KM + 0.01 and h_km <= SEGMENT_LENGTH_KM + 0.01


def test_segment_grid_scales():
    # fr-lyon should be ~120 segments, fr-test 24 (data_config.py:66-67).
    assert len(calculate_segments(AOIs["fr-lyon"], SEGMENT_LENGTH_KM)) == 120
    assert len(calculate_segments(AOIs["fr-test"], SEGMENT_LENGTH_KM)) == 24
    # "fr" is documented as ~12.4k segments (data_config.py:65) — our Vincenty
    # geodesic reproduces the same grid size.
    assert len(calculate_segments(AOIs["fr"], SEGMENT_LENGTH_KM)) == 12474
    assert len(calculate_segments(AOIs["at"], SEGMENT_LENGTH_KM)) == 6832


def test_pixel_size():
    bbox = BBox(north=1.0, south=0.0, east=2.0, west=0.0)
    px, py = pixel_size(bbox, (512, 512))
    assert px == 2.0 / 512 and py == 1.0 / 512


def test_resume_protocol(tmp_path):
    meta = {"aoi": "small", "bands": ["B02"]}
    rs = ResumeState(tmp_path, meta)
    assert rs.load() == set()
    rs.mark_done(3)
    rs.mark_done(1)

    rs2 = ResumeState(tmp_path, meta)
    assert rs2.load() == {1, 3}

    rs3 = ResumeState(tmp_path, {"aoi": "other", "bands": ["B02"]})
    with pytest.raises(RuntimeError):
        rs3.load()

    rs2.finalize()
    assert not rs2.resume_file.exists()
    assert rs2.final_metadata_file.exists()
