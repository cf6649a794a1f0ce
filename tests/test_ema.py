"""Parameter-EMA tests: wrapper math, mixed-precision composition, trainer
eval-on-EMA, checkpoint roundtrip, unfreeze carry-over, CLI wiring.

The reference has no parameter averaging (its nearest hook,
torch.optim.swa_utils, is unused) — ``train_state.with_param_ema`` is an
s2tpu production extension: the EMA lives inside the optimizer state so it
checkpoints/shards/donates for free, and validation + serving run on the
averaged weights (trainer.eval_state, cli/infer --no-ema to opt out).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from s2tpu.configs import segmentation as cfg_lib
from s2tpu.data.pipeline import Datamodule
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.train_state import (
    EmaState,
    NewParams,
    with_f32_master,
    with_param_ema,
)
from s2tpu.train.trainer import SegmentationTrainer

# ------------------------------------------------------------ wrapper math --


def test_with_param_ema_tracks_post_update_params():
    params = {"w": jnp.full((3,), 2.0)}
    tx = with_param_ema(optax.sgd(0.1), decay=0.9)
    state = tx.init(params)
    np.testing.assert_array_equal(np.asarray(state.ema["w"]), 2.0)

    expect = np.full((3,), 2.0, np.float32)
    p = params
    for _ in range(3):
        updates, state = tx.update({"w": jnp.ones((3,))}, state, p)
        p = optax.apply_updates(p, updates)
        expect = 0.9 * expect + 0.1 * np.asarray(p["w"], np.float32)
        np.testing.assert_allclose(np.asarray(state.ema["w"]), expect, rtol=1e-6)


def test_with_param_ema_composes_with_f32_master():
    """Wrapped OUTSIDE with_f32_master: the NewParams marker passes through
    unchanged and the EMA stays f32 while params are bf16."""
    params = {"w": jnp.ones((4,), jnp.bfloat16)}
    tx = with_param_ema(with_f32_master(optax.sgd(0.01)), decay=0.5)
    state = tx.init(params)
    assert isinstance(state, EmaState)
    assert state.ema["w"].dtype == jnp.float32

    updates, state = tx.update({"w": jnp.ones((4,), jnp.bfloat16)}, state, params)
    assert isinstance(updates, NewParams), "mixed-precision contract broken"
    new_params = updates.tree
    assert new_params["w"].dtype == jnp.bfloat16
    # The EMA accumulates from the f32 MASTER (1 - 0.01*1 = 0.99 exactly),
    # not the bf16-quantized working copy — quantization-free average
    # (ADVICE r4). bf16(0.99) = 0.98828 would give 0.99414 instead.
    expect = 0.5 * 1.0 + 0.5 * 0.99
    np.testing.assert_allclose(np.asarray(state.ema["w"]), expect, rtol=1e-6)
    assert not np.allclose(
        np.asarray(state.ema["w"]), 0.5 + 0.5 * np.asarray(new_params["w"], np.float32)
    ), "EMA is averaging the bf16 working params, not the f32 master"


# --------------------------------------------------------- trainer wiring ---


def _ema_config(fixture_dir, **train_overrides):
    c = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    c.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    c.datamodule.batch_size = 2
    c.datamodule.data_split = (0.5, 0.5, 0.0)
    c.datamodule.random_crop_size = 64
    c.train.compute_dtype = "float32"
    c.train.lr = 3e-3
    c.train.log_interval = 1000
    c.train.ema_decay = 0.5
    for k, v in train_overrides.items():
        setattr(c.train, k, v)
    return c


@pytest.fixture(scope="module")
def ema_run(fixture_dir):
    c = _ema_config(fixture_dir)
    trainer = SegmentationTrainer(c, Datamodule(c.datamodule), mesh=mesh_lib.make_mesh(1))
    history = trainer.fit(epochs=2)
    return trainer, history


def test_trainer_ema_state_and_eval(ema_run):
    trainer, history = ema_run
    assert isinstance(trainer.state.opt_state, EmaState)

    es = trainer.eval_state()
    # Same pytree structure (jitted programs are shared) but averaged params.
    assert jax.tree_util.tree_structure(es) == jax.tree_util.tree_structure(trainer.state)
    raw = jax.tree_util.tree_leaves(trainer.state.params)
    avg = jax.tree_util.tree_leaves(es.params)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(raw, avg)
    ), "EMA params identical to live params after training"
    # eval params == the stored EMA, cast to the working dtype
    ema_leaves = jax.tree_util.tree_leaves(trainer.state.opt_state.ema)
    for a, e in zip(avg, ema_leaves):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(e, np.float32), rtol=1e-6
        )
    assert all(np.isfinite(h["val/loss"]) for h in history)


def test_trainer_ema_checkpoint_roundtrip(tmp_path, ema_run):
    from s2tpu.checkpoint.orbax_io import CheckpointManager

    trainer, _ = ema_run
    mgr = CheckpointManager(tmp_path / "ckpts", keep=1)
    mgr.save_epoch(0, trainer.state, metrics={"val/loss": 1.0})
    mgr.wait()
    restored = mgr.restore(trainer.state, epoch=0)
    assert isinstance(restored.opt_state, EmaState)
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.state.opt_state.ema),
        jax.tree_util.tree_leaves(restored.opt_state.ema),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_ema_off_is_identity(fixture_dir):
    c = _ema_config(fixture_dir, ema_decay=None)
    trainer = SegmentationTrainer(c, Datamodule(c.datamodule), mesh=mesh_lib.make_mesh(1))
    assert not isinstance(trainer.state.opt_state, EmaState)
    assert trainer.eval_state() is trainer.state


# ------------------------------------------------------ unfreeze carry-over --


def test_unfreeze_carries_ema(fixture_dir, monkeypatch):
    """The averaged weights survive the frozen->unfrozen optimizer rebuild
    (BASELINE config #4 two-phase + EMA)."""
    from tests.test_bands_unfreeze import _tiny_build_model, _tiny_prithvi_config

    monkeypatch.setattr(cfg_lib.Config, "build_model", _tiny_build_model)
    cfg = _tiny_prithvi_config(fixture_dir, frozen_backbone=True, ema_decay=0.9, max_epochs=1)
    trainer = SegmentationTrainer(cfg, Datamodule(cfg.datamodule), mesh=mesh_lib.make_mesh(1))
    trainer.fit(epochs=1)
    assert isinstance(trainer.state.opt_state, EmaState)
    old_ema = jax.device_get(trainer.state.opt_state.ema)

    trainer.unfreeze_backbone()
    assert isinstance(trainer.state.opt_state, EmaState)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, old_ema, jax.device_get(trainer.state.opt_state.ema)
    )
    # and training continues finitely on the rebuilt step
    batch = next(iter(trainer.dm.train_batches(epoch=1)))
    state, m = trainer.train_step(
        trainer.state, jnp.asarray(batch.images), jnp.asarray(batch.labels), trainer.base_rng
    )
    assert np.isfinite(float(m["loss"]))


def test_export_unet_serves_ema_weights(tmp_path, ema_run):
    """export-unet on an --ema-decay run exports the EMA (served) weights by
    default and the raw params under --no-ema (VERDICT r4 #3: the reverse
    migration must ship the weights that produced the reported metrics)."""
    import dataclasses

    import torch

    from s2tpu.checkpoint.convert_torch import export_reference_unet_state_dict
    from s2tpu.checkpoint.orbax_io import CheckpointManager
    from s2tpu.cli.convert_weights import export_unet_checkpoint

    trainer, _ = ema_run
    ckpt_dir = tmp_path / "ema_ckpt"
    mgr = CheckpointManager(ckpt_dir, config_dict=dataclasses.asdict(trainer.config))
    mgr.save_epoch(0, trainer.state, metrics={"val/loss": 1.0})
    mgr.wait()
    mgr.close()

    export_unet_checkpoint(str(ckpt_dir), str(tmp_path / "ema.pt"))
    export_unet_checkpoint(str(ckpt_dir), str(tmp_path / "raw.pt"), use_ema=False)
    got_ema = {k: v.numpy() for k, v in torch.load(tmp_path / "ema.pt").items()}
    got_raw = {k: v.numpy() for k, v in torch.load(tmp_path / "raw.pt").items()}

    stats = jax.device_get(trainer.state.batch_stats)
    want_ema = export_reference_unet_state_dict(
        jax.device_get(trainer.state.opt_state.ema), stats
    )
    want_raw = export_reference_unet_state_dict(jax.device_get(trainer.state.params), stats)
    assert set(got_ema) == set(want_ema)
    for k in want_ema:
        np.testing.assert_array_equal(got_ema[k], np.asarray(want_ema[k]), err_msg=k)
        np.testing.assert_array_equal(got_raw[k], np.asarray(want_raw[k]), err_msg=k)
    assert any(
        not np.array_equal(got_ema[k], got_raw[k]) for k in got_ema
    ), "EMA export identical to raw export after training"


# ------------------------------------------------------------------- CLIs ---


def test_train_cli_ema_flag():
    from s2tpu.cli.train_segmentation import build_parser, config_from_args

    args = build_parser().parse_args(
        ["small", "osm-multiclass", "efficientnet-unet-b0", "--ema-decay", "0.99"]
    )
    assert config_from_args(args).train.ema_decay == 0.99
    args = build_parser().parse_args(["small", "osm-multiclass", "efficientnet-unet-b0"])
    assert config_from_args(args).train.ema_decay is None


def test_mae_cli_ema_flag():
    from s2tpu.cli.train_mae import build_parser, config_from_args

    args = build_parser().parse_args(["small", "--ema-decay", "0.999"])
    assert config_from_args(args).train.ema_decay == 0.999
