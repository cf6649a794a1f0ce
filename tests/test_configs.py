"""Config-system + label-taxonomy parity tests (reference semantics goldens)."""

import numpy as np
import pytest

from s2tpu.configs import segmentation as cfg
from s2tpu.configs.cnes_labels import CNES_TO_SIMPLIFIED, cnes_remap_lut
from s2tpu.configs.data_config import AOIs, BANDS, LABEL_MAPS, SEGMENT_LENGTH_KM, SEGMENT_SIZE


def test_label_map_registry():
    # Same 9 maps as reference data_config.py:80-90.
    assert set(LABEL_MAPS) == {
        "osm-multiclass",
        "osm-impervious-binary",
        "osm-nature-binary",
        "osm-agriculture-binary",
        "cnes-full",
        "cnes-multiclass",
        "cnes-impervious-binary",
        "cnes-nature-binary",
        "cnes-agriculture-binary",
    }
    assert LABEL_MAPS["osm-multiclass"].num_classes == 4
    assert LABEL_MAPS["osm-multiclass"].class_names == (
        "other",
        "agriculture",
        "nature",
        "impervious_surface",
    )
    assert LABEL_MAPS["osm-impervious-binary"].num_classes == 2
    assert LABEL_MAPS["cnes-full"].num_classes == 24  # 23 classes + background
    assert LABEL_MAPS["cnes-multiclass"].num_classes == 4
    # index 0 is always the background/"other" class
    for m in LABEL_MAPS.values():
        assert m.class_names[0] == "other"
        assert m.colors[0] == "#000000"


def test_osm_tag_semantics():
    agri = LABEL_MAPS["osm-agriculture-binary"].classes[1]
    assert agri.tags["crop"] is True
    assert "farmland" in agri.tags["landuse"]
    imp = LABEL_MAPS["osm-impervious-binary"].classes[1]
    assert imp.tags["building"] is True and imp.tags["highway"] is True


def test_cnes_remap_lut_multiclass():
    lut = cnes_remap_lut("cnes-multiclass", LABEL_MAPS["cnes-multiclass"].classes)
    assert lut is not None
    assert lut[0] == 0  # outside France stays background
    # reference golden mapping (cnes_labell_mappings.py:50-74):
    # classes order: other(0), agriculture(1), nature(2), impervious(3)
    assert list(lut[1:5]) == [3, 3, 3, 3]  # built-up + roads -> impervious
    assert list(lut[5:13]) == [1] * 8  # crops -> agriculture
    assert lut[13] == 2  # grasslands -> nature
    assert list(lut[14:16]) == [1, 1]  # orchards/vineyards -> agriculture
    assert list(lut[16:24]) == [2] * 8  # forests/water/etc -> nature
    assert all(lut[24:] == 0)


def test_cnes_remap_binary_drops_other_groups():
    lut = cnes_remap_lut("cnes-nature-binary", LABEL_MAPS["cnes-nature-binary"].classes)
    labels = np.array([0, 1, 5, 13, 16, 23], dtype=np.uint8)
    remapped = lut[labels]
    # only nature raster values map to class 1; impervious/agri fall to 0
    assert list(remapped) == [0, 0, 0, 1, 1, 1]


def test_cnes_full_is_identity():
    assert cnes_remap_lut("cnes-full", LABEL_MAPS["cnes-full"].classes) is None
    assert cnes_remap_lut("osm-multiclass", LABEL_MAPS["osm-multiclass"].classes) is None


def test_remap_lut_consistent_with_reference_dict():
    lut = cnes_remap_lut("cnes-multiclass", LABEL_MAPS["cnes-multiclass"].classes)
    names = LABEL_MAPS["cnes-multiclass"].class_names
    for raw, group in CNES_TO_SIMPLIFIED.items():
        assert lut[raw] == names.index(group)


def test_data_constants():
    assert BANDS == ["B02", "B03", "B04", "B8A", "B11", "B12"]
    assert SEGMENT_SIZE == (512, 512)
    assert SEGMENT_LENGTH_KM == 5.12
    assert set(AOIs) == {"vie", "test", "at", "small", "fr", "fr-lyon", "fr-test"}


def test_base_config_composition():
    c = cfg.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    assert c.num_classes == 4
    assert c.datamodule.dataset_cfg.squeeze_time_dim is True  # UNet forces single frame
    assert c.datamodule.batch_size == 32
    assert c.train.loss_type == cfg.LossType.CE
    assert c.train.masked_loss is True


def test_run_type_presets():
    c = cfg.set_run_type(cfg.base_config("efficientnet-unet-b0"), "debug")
    assert c.datamodule.batch_size == 1 and "debug" in c.train.tags
    c2 = cfg.set_run_type(cfg.base_config("efficientnet-unet-b0"), "overfit")
    assert c2.train.overfit_batches == 1 and c2.datamodule.augment is False


def test_prithvi_config_requires_time_dim():
    c = cfg.base_config("fc-prithvi-backbone")
    assert c.datamodule.dataset_cfg.squeeze_time_dim is False


def test_unet_rejects_multi_frame():
    with pytest.raises(AssertionError):
        c = cfg.base_config("efficientnet-unet-b0")
        c.datamodule.dataset_cfg.n_time_frames = 3
        cfg.Config(model_name=c.model_name, datamodule=c.datamodule, train=c.train)


def test_mae_lr_scaling():
    """effective_bs is the GLOBAL batch (already sharded over the mesh), so
    the device count must NOT multiply into the MAE LR rule — the reference's
    batch_size*devices applies to Lightning's PER-DEVICE loader batch
    (prithvi_mae_finetune.py:117-118), a different batch semantic."""
    from s2tpu.configs import mae

    c = mae.base_config()
    c.train.num_devices = 4  # must not change the effective batch
    c = mae.pretrain(c)
    assert c.datamodule.batch_size == 64
    assert c.train.from_scratch is True
    np.testing.assert_allclose(c.train.lr, 1.5e-4 * 64 / 256)
