"""Preemption-safe checkpointing: SIGTERM → mid-epoch save → exact resume.

TPU spot preemption / maintenance sends SIGTERM; fit() installs a handler
that checkpoints full training state at the next step boundary together with
a marker of how far into the epoch training got. Resume replays the epoch's
deterministic draw stream, skipping the trained prefix — the continued run
matches an uninterrupted run to float equality. (The reference has no
equivalent: Lightning restarts at the last epoch boundary at best.)
"""

import signal

import jax
import numpy as np
import pytest

from s2tpu.configs import mae as mae_cfg
from s2tpu.configs import segmentation as cfg_lib
from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig
from s2tpu.checkpoint.orbax_io import CheckpointManager
from s2tpu.data.dataset import TiffSource
from s2tpu.data.pipeline import Datamodule
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.mae_trainer import MAETrainer
from s2tpu.train.trainer import SegmentationTrainer


def _seg_trainer(fixture_dir, ckpt_dir, steps_per_dispatch: int = 1):
    c = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    c.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    c.datamodule.batch_size = 2
    c.datamodule.data_split = (1.0, 0.0, 0.0)
    c.datamodule.random_crop_size = 64
    c.train.compute_dtype = "float32"
    c.train.device_corpus = True
    c.train.steps_per_dispatch = steps_per_dispatch
    c.train.max_epochs = 1
    dm = Datamodule(c.datamodule)
    ckpt = CheckpointManager(ckpt_dir) if ckpt_dir else None
    return SegmentationTrainer(c, dm, mesh=mesh_lib.make_mesh(1), checkpoint_manager=ckpt)


def _sigterm_after_first_step(trainer, step_attr: str):
    """Wrap a jitted step so the FIRST call raises a real SIGTERM afterwards
    (exercises the installed handler, not just the flag)."""
    orig = getattr(trainer, step_attr)
    calls = {"n": 0}

    def wrapped(*a, **kw):
        out = orig(*a, **kw)
        calls["n"] += 1
        if calls["n"] == 1:
            signal.raise_signal(signal.SIGTERM)
        return out

    setattr(trainer, step_attr, wrapped)


@pytest.mark.slow
def test_seg_preempt_save_and_exact_resume(fixture_dir, tmp_path):
    # Uninterrupted reference trajectory (3 batches: 6 segments, bs 2).
    ref = _seg_trainer(fixture_dir, tmp_path / "ref")
    ref.fit(epochs=1)
    assert int(ref.state.step) == 3

    # Interrupted run: real SIGTERM after the first optimizer step.
    ckpt_dir = tmp_path / "int"
    t = _seg_trainer(fixture_dir, ckpt_dir)
    _sigterm_after_first_step(t, "train_step_indexed")
    history = t.fit(epochs=1)
    assert history == []  # epoch never completed
    assert int(t.state.step) == 1
    assert t.ckpt.has_preempt()
    t.ckpt.close()

    # Resume: exact mid-epoch continuation finishes batches 1 and 2.
    r = _seg_trainer(fixture_dir, ckpt_dir)
    start = r.resume_from_checkpoint()
    assert start == 0 and r._skip_batches == 1
    assert int(r.state.step) == 1
    r.fit(epochs=1, start_epoch=start)
    assert int(r.state.step) == 3
    assert not r.ckpt.has_preempt()  # marker cleared after the epoch completed
    for a, b in zip(
        jax.tree_util.tree_leaves(ref.state.params), jax.tree_util.tree_leaves(r.state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_seg_preempt_fused_dispatch_window(fixture_dir, tmp_path):
    """Preemption inside fused-dispatch mode (steps_per_dispatch=2): the
    interrupt lands at a WINDOW boundary (2 optimizer steps done), resume
    skips the trained prefix and finishes the remainder batch."""
    ref = _seg_trainer(fixture_dir, tmp_path / "ref", steps_per_dispatch=2)
    ref.fit(epochs=1)
    assert int(ref.state.step) == 3  # one fused window (2) + remainder (1)

    ckpt_dir = tmp_path / "int"
    t = _seg_trainer(fixture_dir, ckpt_dir, steps_per_dispatch=2)
    _sigterm_after_first_step(t, "train_step_indexed_multi")
    assert t.fit(epochs=1) == []
    assert int(t.state.step) == 2  # the full window committed before the stop
    assert t.ckpt.has_preempt()
    t.ckpt.close()

    r = _seg_trainer(fixture_dir, ckpt_dir, steps_per_dispatch=2)
    start = r.resume_from_checkpoint()
    assert start == 0 and r._skip_batches == 2
    r.fit(epochs=1, start_epoch=start)
    assert int(r.state.step) == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(ref.state.params), jax.tree_util.tree_leaves(r.state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_seg_preempt_between_epochs(fixture_dir, tmp_path):
    """A preemption flag that lands between epochs (e.g. during eval) is
    caught by the pre-epoch check: the save records (next_epoch, 0 batches)
    and resume re-enters at that epoch boundary with nothing to skip."""
    ckpt_dir = tmp_path / "ck"
    t = _seg_trainer(fixture_dir, ckpt_dir)
    t.fit(epochs=1)  # epoch 0 completes normally
    t._preempt_requested = True  # SIGTERM during the eval/boundary window
    assert t.fit(epochs=2, start_epoch=1) == []
    assert t.ckpt.has_preempt()
    t.ckpt.close()

    r = _seg_trainer(fixture_dir, ckpt_dir)
    start = r.resume_from_checkpoint()
    assert start == 1 and r._skip_batches == 0
    assert int(r.state.step) == 3  # epoch 0's three optimizer steps
    r.fit(epochs=2, start_epoch=start)
    assert int(r.state.step) == 6
    assert not r.ckpt.has_preempt()


@pytest.mark.slow
def test_mae_preempt_streamed_resume(fixture_dir, tmp_path):
    """Same contract on the MAE trainer's host-streamed loop (islice skip)."""
    from tests.test_mae_trainer import TINY

    def build(ckpt_dir):
        c = mae_cfg.base_config(aoi="small")
        c.datamodule.dataset_cfg.data_dir = str(fixture_dir)
        c.datamodule.batch_size = 2
        c.datamodule.random_crop_size = 32
        c.datamodule.data_split = (1.0, 0.0, 0.0)
        c.train.from_scratch = True
        c.train.lr = 1e-3
        c.train.max_epochs = 1
        source = TiffSource("small", "osm-multiclass", data_dir=fixture_dir, require_labels=False)
        dm = Datamodule(
            DatamoduleConfig(
                dataset_cfg=DatasetConfig(
                    aoi="small", label_map="osm-multiclass", data_dir=str(fixture_dir)
                ),
                batch_size=2,
                data_split=(1.0, 0.0, 0.0),
                random_crop_size=32,
            ),
            source=source,
        )
        ckpt = CheckpointManager(ckpt_dir) if ckpt_dir else None
        return MAETrainer(
            c, dm, mesh=mesh_lib.make_mesh(1), model_config=TINY, checkpoint_manager=ckpt
        )

    ref = build(tmp_path / "ref")
    ref.fit(epochs=1)
    assert int(ref.state.step) == 3

    ckpt_dir = tmp_path / "int"
    t = build(ckpt_dir)
    _sigterm_after_first_step(t, "train_step")
    assert t.fit(epochs=1) == []
    assert int(t.state.step) == 1 and t.ckpt.has_preempt()
    t.ckpt.close()

    r = build(ckpt_dir)
    start = r.resume_from_checkpoint()
    assert start == 0 and r._skip_batches == 1
    r.fit(epochs=1, start_epoch=start)
    assert int(r.state.step) == 3
    assert not r.ckpt.has_preempt()
    for a, b in zip(
        jax.tree_util.tree_leaves(ref.state.params), jax.tree_util.tree_leaves(r.state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_cli_auto_resume(fixture_dir, tmp_path, monkeypatch):
    """--auto-resume: rerunning the SAME command line (spot-instance restart
    loop) picks up the run's own checkpoint dir — including epoch state —
    without an explicit --resume-from. The run name must be deterministic
    for this to work (no random id when --auto-resume is set)."""
    from s2tpu.checkpoint.orbax_io import CheckpointManager
    from s2tpu.cli import train_segmentation as cli

    monkeypatch.setattr(cli, "CKPT_DIR", tmp_path / "ckpts")
    monkeypatch.setattr(cli, "LOG_DIR", tmp_path / "logs")
    argv = [
        "small", "osm-multiclass", "efficientnet-unet-b0",
        "--data-dir", str(fixture_dir), "--bs", "2", "--crop", "64",
        "--compute-dtype", "float32", "--num-devices", "1",
        "--wandb", "--name", "ar", "--auto-resume",
    ]
    cli.main([*argv, "--epochs", "1"])
    ckpt_dir = tmp_path / "ckpts" / "sentinel-segmentation" / "ar_sentinel-segmentation"
    assert ckpt_dir.exists(), "auto-resume run name must be deterministic"
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_epoch() == 0
    mgr.close()

    # Same command, more epochs: resumes at epoch 1 instead of restarting.
    cli.main([*argv, "--epochs", "2"])
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_epoch() == 1
    mgr.close()
