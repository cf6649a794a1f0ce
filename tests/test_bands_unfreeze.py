"""Configurable band sets (BASELINE config #3) + frozen->unfrozen backbone
transition (BASELINE config #4).

Reference anchors: data_config.py:72 (fixed 6-band list),
configs/segmentation.py:171 (frozen_backbone preset field),
modules/prithvi_segmentation.py:152-154 (requires_grad_(False) freeze).
s2tpu extends both: any L2A band subset end-to-end, and an in-run unfreeze
transition with a fresh maskless optimizer.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2tpu.configs import segmentation as cfg_lib
from s2tpu.configs.data_config import BANDS, BANDS_ALL12, parse_bands
from s2tpu.data.dataset import TiffSource, make_synthetic_fixture
from s2tpu.data.pipeline import Datamodule
from s2tpu.models.prithvi_mae import PrithviConfig
from s2tpu.models.prithvi_seg import PrithviSegmentationConfig, PrithviSegmentationNet
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.trainer import SegmentationTrainer


# ---------------------------------------------------------------- bands ----
def test_parse_bands():
    assert parse_bands("default") == BANDS
    assert parse_bands("all12") == BANDS_ALL12
    assert parse_bands("B02,B03,B04") == ["B02", "B03", "B04"]
    assert parse_bands(["B8A", "B11"]) == ["B8A", "B11"]
    with pytest.raises(ValueError, match="unknown"):
        parse_bands("B02,B99")
    with pytest.raises(ValueError, match="empty"):
        parse_bands(",")


def test_dataset_config_bands_drive_in_channels():
    cfg = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    assert cfg.datamodule.dataset_cfg.in_channels == 6
    cfg.datamodule.dataset_cfg.bands = parse_bands("all12")
    assert cfg.datamodule.dataset_cfg.in_channels == 12
    model = cfg.build_model()
    assert model.config.in_channels == 12


def test_train_cli_bands_flag():
    from s2tpu.cli.train_segmentation import build_parser, config_from_args

    args = build_parser().parse_args(
        ["small", "osm-multiclass", "efficientnet-unet-b0", "--bands", "all12"]
    )
    config = config_from_args(args)
    assert config.datamodule.dataset_cfg.bands == BANDS_ALL12
    assert config.datamodule.dataset_cfg.in_channels == 12


def test_prithvi_config_bands_reach_backbone():
    cfg = cfg_lib.base_config("fc-prithvi-backbone", aoi="small", label_map="osm-multiclass")
    cfg.datamodule.dataset_cfg.bands = parse_bands("all12")
    model = cfg.build_model()
    assert model.config.backbone.in_chans == 12


def test_download_cli_bands_flag(monkeypatch, tmp_path):
    """--bands all12 reaches the fetcher construction and the resume metadata."""
    import s2tpu.cli.download_sentinel as dl_cli

    captured = {}

    def fake_fetcher(bands=None, **kw):
        captured["fetch_bands"] = bands
        return lambda segment, interval: np.zeros((8, 8, len(bands)), np.int16)

    def fake_download(aoi, fetch_fn, bands=None, **kw):
        captured["dl_bands"] = bands
        return 0

    monkeypatch.setattr("s2tpu.geo.providers.sentinel_fetcher", fake_fetcher)
    monkeypatch.setattr(dl_cli, "download_sentinel", fake_download)
    dl_cli.main(["small", "--bands", "all12", "--data-dir", str(tmp_path)])
    assert captured["fetch_bands"] == BANDS_ALL12
    assert captured["dl_bands"] == BANDS_ALL12


@pytest.fixture(scope="module")
def fixture12(tmp_path_factory):
    root = tmp_path_factory.mktemp("data12")
    make_synthetic_fixture(
        root, aoi="small", label_map="osm-multiclass", n_segments=4, size=(64, 64), n_bands=12
    )
    return root


def _unet12_config(fixture12):
    cfg = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    cfg.datamodule.dataset_cfg.bands = parse_bands("all12")
    cfg.datamodule.dataset_cfg.data_dir = str(fixture12)
    cfg.datamodule.batch_size = 2
    cfg.datamodule.random_crop_size = 32
    cfg.datamodule.data_split = (1.0, 0.0, 0.0)
    cfg.train.compute_dtype = "float32"
    cfg.train.max_epochs = 1
    return cfg


@pytest.mark.slow
def test_12band_unet_train_step(fixture12):
    """A 12-band B0 trains end-to-end on a 12-band fixture (config #3 bands)."""
    cfg = _unet12_config(fixture12)
    src = TiffSource("small", "osm-multiclass", data_dir=str(fixture12))
    dm = Datamodule(cfg.datamodule, source=src)
    trainer = SegmentationTrainer(cfg, dm, mesh=mesh_lib.make_mesh(1))
    assert len(np.asarray(trainer.mean)) == 12
    metrics = trainer.run_train_epoch(0)
    assert np.isfinite(metrics["loss"])


def test_band_count_mismatch_raises(fixture12):
    """6-band config over 12-band rasters must fail loudly, not at some
    conv shape deep in the model."""
    cfg = _unet12_config(fixture12)
    cfg.datamodule.dataset_cfg.bands = parse_bands("default")  # wrong: data is 12-band
    src = TiffSource("small", "osm-multiclass", data_dir=str(fixture12))
    dm = Datamodule(cfg.datamodule, source=src)
    with pytest.raises(ValueError, match="band-count mismatch"):
        SegmentationTrainer(cfg, dm, mesh=mesh_lib.make_mesh(1))


def test_prithvi_12band_skips_published_weights(fixture12, caplog):
    """fc-prithvi at in_chans=12: the published 6-band Prithvi_100M.pt must be
    rejected up front with a clear message; the trainer still constructs."""
    import logging

    cfg = cfg_lib.base_config("fc-prithvi-backbone", aoi="small", label_map="osm-multiclass")
    cfg.datamodule.dataset_cfg.bands = parse_bands("all12")
    cfg.datamodule.dataset_cfg.data_dir = str(fixture12)
    cfg.datamodule.batch_size = 2
    cfg.datamodule.random_crop_size = 32
    cfg.datamodule.data_split = (1.0, 0.0, 0.0)
    cfg.train.compute_dtype = "float32"
    src = TiffSource("small", "osm-multiclass", data_dir=str(fixture12))
    dm = Datamodule(cfg.datamodule, source=src)
    with caplog.at_level(logging.WARNING):
        trainer = SegmentationTrainer(cfg, dm, mesh=mesh_lib.make_mesh(1))
    assert any("cannot initialize this" in r.message for r in caplog.records)
    pe = trainer.state.params["backbone"]["patch_proj"]["kernel"]
    assert pe.shape[0] == 1 * 16 * 16 * 12  # flattened (t, h, w, C_in)


def test_prithvi_custom_6band_set_skips_published_weights(fixture_dir, caplog, monkeypatch):
    """Band IDENTITY, not count, gates the published Prithvi_100M.pt: a
    custom 6-band set (B02..B07) must not silently load weights trained on
    the Prithvi-HLS six (B02,B03,B04,B8A,B11,B12)."""
    import logging

    monkeypatch.setattr(cfg_lib.Config, "build_model", _tiny_build_model)
    cfg = _tiny_prithvi_config(fixture_dir)
    cfg.datamodule.dataset_cfg.bands = parse_bands("B02,B03,B04,B05,B06,B07")
    src = TiffSource("small", "osm-multiclass", data_dir=str(fixture_dir))
    dm = Datamodule(cfg.datamodule, source=src)
    with caplog.at_level(logging.WARNING):
        SegmentationTrainer(cfg, dm, mesh=mesh_lib.make_mesh(1))
    assert any("cannot initialize this" in r.message for r in caplog.records)


def test_mae_custom_6band_set_uses_dataset_stats(fixture_dir):
    """The published Prithvi mean/std belong to the HLS six specifically: a
    custom 6-band MAE pretrain must normalize with dataset statistics."""
    from s2tpu.configs import mae as mae_cfg
    from s2tpu.models.prithvi_mae import PrithviConfig
    from s2tpu.train.mae_trainer import MAETrainer

    tiny = PrithviConfig(
        img_size=32, patch_size=8, num_frames=1, tubelet_size=1, in_chans=6,
        embed_dim=64, depth=1, num_heads=4, decoder_embed_dim=48,
        decoder_depth=1, decoder_num_heads=4,
    )
    c = mae_cfg.base_config(aoi="small")
    c.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    c.datamodule.dataset_cfg.bands = "B02,B03,B04,B05,B06,B07"  # NOT the HLS six
    c.datamodule.batch_size = 2
    c.datamodule.random_crop_size = 32
    c.train.from_scratch = True
    src = TiffSource("small", "osm-multiclass", data_dir=str(fixture_dir), require_labels=False)
    dm = Datamodule(
        cfg_lib.DatamoduleConfig(
            dataset_cfg=cfg_lib.DatasetConfig(
                aoi="small", label_map="osm-multiclass", data_dir=str(fixture_dir)
            ),
            batch_size=2, data_split=(1.0, 0.0, 0.0), random_crop_size=32,
        ),
        source=src,
    )
    dm.set_mean_std(np.full(6, 111.0, np.float32), np.full(6, 7.0, np.float32))
    trainer = MAETrainer(c, dm, mesh=mesh_lib.make_mesh(1), model_config=tiny)
    np.testing.assert_allclose(np.asarray(trainer.mean), 111.0)

    # The default (HLS six) band set keeps the published normalization.
    from s2tpu.utils import load_prithvi_mean_std

    c2 = mae_cfg.base_config(aoi="small")
    c2.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    c2.datamodule.batch_size = 2
    c2.datamodule.random_crop_size = 32
    c2.train.from_scratch = True
    trainer2 = MAETrainer(c2, dm, mesh=mesh_lib.make_mesh(1), model_config=tiny)
    pub_mean, _ = load_prithvi_mean_std()
    np.testing.assert_allclose(np.asarray(trainer2.mean), np.asarray(pub_mean))


# -------------------------------------------------------------- unfreeze ----
def _tiny_build_model(self):
    """Tiny fc-prithvi stand-in honoring train.frozen_backbone — keeps the
    transition tests' compiles cheap while exercising the REAL trainer path
    (unfreeze_backbone rebuilds via config.build_model)."""
    crop = self.datamodule.random_crop_size
    return PrithviSegmentationNet(
        PrithviSegmentationConfig(
            num_frames=1, num_classes=self.num_classes, fcn_out_channels=16,
            fcn_num_convs=1, fcn_dropout=0.0,
            frozen_backbone=self.train.frozen_backbone,
            # patch_size=16: the neck's fixed 16x upsample lands back on crop
            embed_dim=64, patch_height=crop // 16, patch_width=crop // 16,
            backbone=PrithviConfig(
                img_size=crop, patch_size=16, num_frames=1, in_chans=6, embed_dim=64,
                depth=1, num_heads=4, decoder_embed_dim=48, decoder_depth=1,
                decoder_num_heads=4,
            ),
        )
    )


def _tiny_prithvi_config(fixture_dir, **train_overrides):
    cfg = cfg_lib.base_config("fc-prithvi-backbone", aoi="small", label_map="osm-multiclass")
    cfg.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    cfg.datamodule.batch_size = 2
    cfg.datamodule.random_crop_size = 32
    cfg.datamodule.data_split = (1.0, 0.0, 0.0)
    cfg.train.compute_dtype = "float32"
    for k, v in train_overrides.items():
        setattr(cfg.train, k, v)
    return cfg


def _backbone_norm(state):
    return sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(state.params["backbone"])
    )


def test_unfreeze_cli_flags():
    from s2tpu.cli.train_segmentation import build_parser, config_from_args

    args = build_parser().parse_args(
        ["small", "osm-multiclass", "fc-prithvi-backbone", "--unfreeze-at-epoch", "3"]
    )
    config = config_from_args(args)
    assert config.train.frozen_backbone is True
    assert config.train.unfreeze_backbone_at_epoch == 3

    args = build_parser().parse_args(
        ["small", "osm-multiclass", "fc-prithvi-backbone", "--unfreeze-backbone"]
    )
    assert config_from_args(args).train.frozen_backbone is False


def test_unfrozen_backbone_from_start(fixture_dir, monkeypatch):
    """frozen_backbone=False trains the encoder from epoch 0."""
    monkeypatch.setattr(cfg_lib.Config, "build_model", _tiny_build_model)
    cfg = _tiny_prithvi_config(fixture_dir, frozen_backbone=False, max_epochs=1)
    trainer = SegmentationTrainer(cfg, Datamodule(cfg.datamodule), mesh=mesh_lib.make_mesh(1))
    before = _backbone_norm(trainer.state)
    trainer.fit(epochs=1)
    assert _backbone_norm(trainer.state) != before


def test_unfreeze_transition_mid_fit(fixture_dir, monkeypatch):
    """Two-phase finetune: backbone params frozen through epoch 0, training
    after the scheduled transition; loss stays finite across the optimizer
    rebuild."""
    monkeypatch.setattr(cfg_lib.Config, "build_model", _tiny_build_model)
    cfg = _tiny_prithvi_config(
        fixture_dir, frozen_backbone=True, unfreeze_backbone_at_epoch=1, max_epochs=2
    )
    trainer = SegmentationTrainer(cfg, Datamodule(cfg.datamodule), mesh=mesh_lib.make_mesh(1))
    init_norm = _backbone_norm(trainer.state)
    step0 = int(trainer.state.step)

    history = trainer.fit(epochs=1)  # phase 1 (frozen)
    assert _backbone_norm(trainer.state) == init_norm
    assert trainer.model.config.frozen_backbone is True

    history += trainer.fit(epochs=2, start_epoch=1)  # phase 2 (unfrozen)
    assert trainer.model.config.frozen_backbone is False
    assert _backbone_norm(trainer.state) != init_norm
    # step counter carried across the transition (no restart)
    assert int(trainer.state.step) > step0 + 1
    assert all(np.isfinite(h["train/loss"]) for h in history)


def test_unfreeze_preserves_f32_master(fixture_dir, monkeypatch):
    """param_dtype=bfloat16 two-phase: the transition must carry the exact
    phase-1 f32 master over — re-deriving it from the bf16 working params
    would quantize away the head's accumulated sub-bf16 residuals."""
    from s2tpu.train.train_state import MasterState

    monkeypatch.setattr(cfg_lib.Config, "build_model", _tiny_build_model)
    cfg = _tiny_prithvi_config(
        fixture_dir, frozen_backbone=True, param_dtype="bfloat16", max_epochs=1
    )
    trainer = SegmentationTrainer(cfg, Datamodule(cfg.datamodule), mesh=mesh_lib.make_mesh(1))
    trainer.fit(epochs=1)  # phase 1: the head's master drifts below bf16
    assert isinstance(trainer.state.opt_state, MasterState)
    old_master = jax.device_get(trainer.state.opt_state.master)

    trainer.unfreeze_backbone()
    new_master = jax.device_get(trainer.state.opt_state.master)
    jax.tree_util.tree_map(np.testing.assert_array_equal, old_master, new_master)
    # The carried master differs from the bf16 params upcast — i.e. the
    # sub-bf16 residuals actually survived (the bug would zero this out).
    upcast = jax.device_get(
        jax.tree_util.tree_map(
            lambda p: np.asarray(p, np.float32), trainer.state.params
        )
    )
    max_diffs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda m, b: float(np.abs(np.asarray(m, np.float32) - b).max()),
            new_master, upcast,
        )
    )
    assert any(d > 0 for d in max_diffs)


@pytest.mark.slow
def test_unfreeze_resume_across_transition(fixture_dir, tmp_path, monkeypatch):
    """A checkpoint saved AFTER the transition restores into a fresh trainer:
    resume_from_checkpoint must rebuild the maskless opt_state template
    before Orbax restore (structure mismatch otherwise)."""
    from s2tpu.checkpoint.orbax_io import CheckpointManager

    monkeypatch.setattr(cfg_lib.Config, "build_model", _tiny_build_model)
    cfg = _tiny_prithvi_config(
        fixture_dir, frozen_backbone=True, unfreeze_backbone_at_epoch=1, max_epochs=2
    )
    ckpt = CheckpointManager(tmp_path / "ckpt", keep=2, config_dict=dataclasses.asdict(cfg))
    trainer = SegmentationTrainer(
        cfg, Datamodule(cfg.datamodule), mesh=mesh_lib.make_mesh(1), checkpoint_manager=ckpt
    )
    trainer.fit(epochs=2)  # epoch 0 frozen, epoch 1 unfrozen; ckpt saved each epoch
    ckpt.wait()
    want = jax.device_get(trainer.state.params)

    cfg2 = _tiny_prithvi_config(
        fixture_dir, frozen_backbone=True, unfreeze_backbone_at_epoch=1, max_epochs=2
    )
    ckpt2 = CheckpointManager(tmp_path / "ckpt", keep=2, config_dict=dataclasses.asdict(cfg2))
    trainer2 = SegmentationTrainer(
        cfg2, Datamodule(cfg2.datamodule), mesh=mesh_lib.make_mesh(1), checkpoint_manager=ckpt2
    )
    start = trainer2.resume_from_checkpoint()
    assert start == 2
    assert trainer2.model.config.frozen_backbone is False  # transitioned pre-restore
    got = jax.device_get(trainer2.state.params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, want, got)
