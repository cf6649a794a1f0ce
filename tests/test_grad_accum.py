"""Gradient accumulation: scan-of-microbatches inside the jit'd step."""

import dataclasses

import jax
import numpy as np
import pytest

from s2tpu.configs import segmentation as cfg_lib
from s2tpu.data.pipeline import Datamodule
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.trainer import SegmentationTrainer


@pytest.fixture()
def setup(fixture_dir):
    def build(accum: int):
        config = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
        config.datamodule.dataset_cfg.data_dir = str(fixture_dir)
        config.datamodule.batch_size = 4
        config.datamodule.random_crop_size = 64
        config.datamodule.data_split = (1.0, 0.0, 0.0)
        config.datamodule.augment = False
        config.train.compute_dtype = "float32"
        config.train.masked_loss = False  # fixed pixel count -> grouping-exact loss
        config.train.grad_accum_steps = accum
        dm = Datamodule(config.datamodule)
        return SegmentationTrainer(config, dm, mesh=mesh_lib.make_mesh(1))

    return build


@pytest.mark.slow
def test_grad_accum_matches_single_step_loss(setup):
    t1, t2 = setup(1), setup(2)
    batch = next(iter(t1.dm.train_batches(epoch=0)))
    # the step donates its state buffers — snapshot params before stepping
    params_before = jax.tree_util.tree_map(np.asarray, t2.state.params)
    s1, m1 = t1.train_step(t1.state, batch.images, batch.labels, t1.base_rng)
    s2, m2 = t2.train_step(t2.state, batch.images, batch.labels, t2.base_rng)
    assert np.isfinite(float(m2["loss"]))
    # identical params pre-update; only BN microbatch statistics differ
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=0.1)
    # CM counts cover all pixels in both groupings
    assert np.asarray(m1["cm"]).sum() == np.asarray(m2["cm"]).sum()
    assert int(s2.step) == 1
    # parameters actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), params_before, s2.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


@pytest.mark.slow
def test_grad_accum_converges_overfit(setup):
    trainer = setup(2)
    cfg = dataclasses.replace(trainer.config.train)  # noqa: F841 — readability only
    batch = next(iter(trainer.dm.train_batches(epoch=0)))
    state = trainer.state
    losses = []
    for _ in range(12):
        state, m = trainer.train_step(state, batch.images, batch.labels, trainer.base_rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
