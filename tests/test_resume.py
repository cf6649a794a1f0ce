"""Training crash-resume: restore latest checkpoint and continue."""

import numpy as np
import pytest

from s2tpu.checkpoint.orbax_io import CheckpointManager
from s2tpu.configs import segmentation as cfg_lib
from s2tpu.data.pipeline import Datamodule
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.trainer import SegmentationTrainer


def _trainer(fixture_dir, ckpt_dir, n_devices: int = 1):
    c = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    c.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    c.datamodule.batch_size = 2
    c.datamodule.data_split = (1.0, 0.0, 0.0)
    c.datamodule.random_crop_size = 64
    c.train.compute_dtype = "float32"
    c.train.run_name = "resume-test"
    dm = Datamodule(c.datamodule)
    mgr = CheckpointManager(ckpt_dir, keep=2)
    return (
        SegmentationTrainer(c, dm, mesh=mesh_lib.make_mesh(n_devices), checkpoint_manager=mgr),
        mgr,
    )


@pytest.mark.slow
def test_resume_continues_from_latest(fixture_dir, tmp_path):
    t1, mgr1 = _trainer(fixture_dir, tmp_path / "ck")
    t1.fit(epochs=2)
    steps_after_2 = int(t1.state.step)
    mgr1.close()

    # fresh trainer (simulated restart) resumes at epoch 2 with the saved step
    t2, mgr2 = _trainer(fixture_dir, tmp_path / "ck")
    start = t2.resume_from_checkpoint()
    assert start == 2
    assert int(t2.state.step) == steps_after_2
    # params actually came from the checkpoint, not fresh init
    import jax

    p1 = jax.tree_util.tree_leaves(t1.state.params)[0]
    p2 = jax.tree_util.tree_leaves(t2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    history = t2.fit(epochs=3, start_epoch=start)
    assert len(history) == 1  # only epoch 2 ran
    assert int(t2.state.step) > steps_after_2
    mgr2.close()


def test_resume_without_checkpoint_starts_fresh(fixture_dir, tmp_path):
    t, mgr = _trainer(fixture_dir, tmp_path / "empty")
    assert t.resume_from_checkpoint() == 0
    mgr.close()


@pytest.mark.slow
def test_elastic_resume_across_mesh_sizes(fixture_dir, tmp_path):
    """Checkpoint portability across topologies (pod resize): a checkpoint
    written on a 1-device mesh resumes on a 2-device mesh — Orbax re-shards
    arrays onto the restore target's shardings — and the continued training
    matches an uninterrupted single-device run (same global batch, same
    deterministic data stream; 1- vs 2-device psum reduction order differs
    in the last f32 bits, so tolerances follow test_trainer's 1-vs-8-device
    step-equality convention rather than exact equality)."""
    import jax

    # Uninterrupted single-device reference: 2 epochs.
    ref, mgr_ref = _trainer(fixture_dir, tmp_path / "ref")
    ref.fit(epochs=2)
    mgr_ref.close()

    # Epoch 0 on one device, then resume epoch 1 on a 2-device mesh.
    t1, mgr1 = _trainer(fixture_dir, tmp_path / "ck", n_devices=1)
    t1.fit(epochs=1)
    mgr1.close()
    t2, mgr2 = _trainer(fixture_dir, tmp_path / "ck", n_devices=2)
    start = t2.resume_from_checkpoint()
    assert start == 1
    t2.fit(epochs=2, start_epoch=start)
    assert int(t2.state.step) == int(ref.state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref.state.params), jax.tree_util.tree_leaves(t2.state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    mgr2.close()

    # And back down: the 2-device checkpoint restores onto one device.
    t3, mgr3 = _trainer(fixture_dir, tmp_path / "ck", n_devices=1)
    assert t3.resume_from_checkpoint() == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(t2.state.params), jax.tree_util.tree_leaves(t3.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr3.close()
