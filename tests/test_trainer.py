"""End-to-end training-loop tests: overfit convergence, DP mesh, checkpointing.

Mirrors the reference's operational test strategy (debug/overfit presets,
SURVEY.md §4) plus the multi-device tests it never had.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2tpu.configs import segmentation as cfg_lib
from s2tpu.data.pipeline import Datamodule
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.trainer import SegmentationTrainer


def small_config(fixture_dir, **train_overrides):
    c = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    c.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    c.datamodule.batch_size = 2
    c.datamodule.data_split = (0.5, 0.5, 0.0)
    c.datamodule.random_crop_size = 64  # must be divisible by 32 (UNet depth)
    c.train.lr = 3e-3
    c.train.compute_dtype = "float32"
    c.train.log_interval = 1000
    for k, v in train_overrides.items():
        setattr(c.train, k, v)
    return c


@pytest.fixture(scope="module")
def overfit_run(fixture_dir):
    c = small_config(fixture_dir)
    c = cfg_lib.overfit(c)
    dm = Datamodule(c.datamodule)
    mesh = mesh_lib.make_mesh(1)
    trainer = SegmentationTrainer(c, dm, mesh=mesh)
    history = trainer.fit(epochs=8)
    return trainer, history


def test_overfit_one_batch_converges(overfit_run):
    _, history = overfit_run
    losses = [h["train/loss"] for h in history]
    assert losses[-1] < losses[0] * 0.7, f"no convergence: {losses}"
    assert history[-1]["train/accuracy"] > history[0]["train/accuracy"]


def test_history_contains_metrics(overfit_run):
    _, history = overfit_run
    for key in ["train/loss", "train/iou", "train/accuracy", "train/f1", "val/loss", "val/iou"]:
        assert key in history[0], f"missing {key}"
    assert history[0]["train/images_per_sec"] > 0
    # per-class val IoU as named scalars (finite classes only)
    per_class = {k: v for k, v in history[0].items() if k.startswith("val/iou_")}
    assert per_class, f"no per-class val IoU keys in {sorted(history[0])}"
    assert all(np.isfinite(v) and 0.0 <= v <= 1.0 for v in per_class.values())


def test_predict_step(overfit_run):
    trainer, _ = overfit_run
    batch = next(iter(trainer.dm.eval_batches("val")))
    logits = trainer.predict_step(trainer.state, jnp.asarray(batch.images))
    assert logits.shape == (batch.images.shape[0], 64, 64, 4)


@pytest.mark.slow
def test_data_parallel_step_matches_single_device(tmp_path):
    """The same train step on a 1-device and an 8-device mesh must agree:
    global-batch BN stats + summed grads are identical XLA programs."""
    from s2tpu.data.dataset import make_synthetic_fixture

    make_synthetic_fixture(tmp_path, aoi="small", label_map="osm-multiclass", n_segments=16, size=(64, 64))
    c = small_config(tmp_path)
    c.datamodule.batch_size = 8
    c.datamodule.data_split = (1.0, 0.0, 0.0)
    c.datamodule.augment = False  # deterministic path for comparison
    dm = Datamodule(c.datamodule)
    batch = next(iter(dm.train_batches(epoch=0)))

    t1 = SegmentationTrainer(c, dm, mesh=mesh_lib.make_mesh(1))
    t8 = SegmentationTrainer(c, dm, mesh=mesh_lib.make_mesh(8))

    sharded = jax.device_put(batch.images, mesh_lib.data_sharding(t8.mesh))
    sharded_lbl = jax.device_put(batch.labels, mesh_lib.data_sharding(t8.mesh))

    s1, m1 = t1.train_step(t1.state, jnp.asarray(batch.images), jnp.asarray(batch.labels), t1.base_rng)
    s8, m8 = t8.train_step(t8.state, sharded, sharded_lbl, t8.base_rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    # partitioning changes float summation order -> rare argmax tie flips;
    # allow a handful of pixels to move between confusion-matrix cells
    cm_diff = np.abs(np.asarray(m1["cm"]) - np.asarray(m8["cm"])).sum()
    assert cm_diff <= 8, f"confusion matrices diverge: {cm_diff} pixels"
    # updated params agree across the dp boundary
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)


def test_eval_padding_does_not_change_metrics(fixture_dir):
    c = small_config(fixture_dir)
    dm = Datamodule(c.datamodule)
    trainer = SegmentationTrainer(c, dm, mesh=mesh_lib.make_mesh(1))
    # two eval runs over the same data -> identical metrics (mask correctness)
    m1 = trainer.run_eval_epoch("val")
    m2 = trainer.run_eval_epoch("val")
    np.testing.assert_allclose(m1["loss"], m2["loss"])
    np.testing.assert_array_equal(m1["confusion_matrix"], m2["confusion_matrix"])
    assert m1["support"].sum() > 0


def test_checkpoint_roundtrip(tmp_path, overfit_run):
    from s2tpu.checkpoint.orbax_io import CheckpointManager

    trainer, _ = overfit_run
    mgr = CheckpointManager(tmp_path / "ckpts", keep=2, config_dict={"model": "b0"})
    mgr.save_epoch(0, trainer.state, metrics={"val/loss": 1.0})
    mgr.wait()
    assert mgr.latest_epoch() == 0

    restored = mgr.restore(trainer.state, epoch=0)
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.state.params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(trainer.state.step)
    assert mgr.load_config() == {"model": "b0"}
    mgr.close()


@pytest.mark.slow
def test_checkpoint_best_retention(tmp_path, overfit_run):
    from s2tpu.checkpoint.orbax_io import CheckpointManager

    trainer, _ = overfit_run
    mgr = CheckpointManager(tmp_path / "ck2", keep=1, monitor="val/loss")
    mgr.save_epoch(0, trainer.state, metrics={"val/loss": 0.5})
    mgr.save_epoch(1, trainer.state, metrics={"val/loss": 2.0})
    mgr.wait()
    assert mgr.best_epoch() == 0  # lower val/loss wins
    mgr.close()


@pytest.mark.slow
def test_dice_focal_training_step(fixture_dir):
    """Combined-loss path end to end (components logged per step)."""
    import jax.numpy as jnp

    c = small_config(fixture_dir)
    c.train.loss_type = cfg_lib.LossType.DICE_FOCAL
    c.train.weighted_loss = True
    c.train.class_distribution = [0.0, 0.4, 0.3, 0.3]
    dm = Datamodule(c.datamodule)
    trainer = SegmentationTrainer(c, dm, mesh=mesh_lib.make_mesh(1))
    batch = next(iter(dm.train_batches(epoch=0)))
    _, m = trainer.train_step(
        trainer.state, jnp.asarray(batch.images), jnp.asarray(batch.labels), trainer.base_rng
    )
    assert np.isfinite(float(m["loss"]))
    assert "dice" in m and "focal" in m
    np.testing.assert_allclose(
        float(m["loss"]), float(m["dice"]) + float(m["focal"]), rtol=1e-5
    )


class _ArraySource:
    """Tiny in-memory source for dtype-policy tests."""

    def __init__(self, n=8, hw=64):
        r = np.random.default_rng(0)
        self.images = r.integers(0, 4000, size=(n, hw, hw, 6), dtype=np.int16)
        self.labels = r.integers(0, 4, size=(n, hw, hw)).astype(np.uint8)

    def __len__(self):
        return self.images.shape[0]

    def __getitem__(self, i):
        from s2tpu.data.dataset import Sample

        return Sample(x=self.images[i], y=self.labels[i])


def _dtype_policy_trainer(param_dtype, grad_accum=1):
    c = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    c.datamodule.batch_size = 4
    c.datamodule.random_crop_size = 64
    c.datamodule.data_split = (1.0, 0.0, 0.0)
    c.train.compute_dtype = "bfloat16"
    c.train.param_dtype = param_dtype
    c.train.grad_accum_steps = grad_accum
    dm = Datamodule(c.datamodule, source=_ArraySource())
    dm.set_mean_std(np.full(6, 1500.0, np.float32), np.full(6, 900.0, np.float32))
    return SegmentationTrainer(c, dm, mesh=mesh_lib.make_mesh(1))


@pytest.mark.slow
def test_bf16_params_with_f32_master():
    """param_dtype=bfloat16: params stored bf16, f32 master inside the
    optimizer state, params always the exact cast of the master, and the
    loss trajectory tracks the f32-storage run closely."""
    from s2tpu.train.train_state import MasterState

    t32 = _dtype_policy_trainer("float32")
    t16 = _dtype_policy_trainer("bfloat16")
    r = np.random.default_rng(1)
    img = r.integers(0, 4000, size=(4, 64, 64, 6), dtype=np.int16)
    lbl = r.integers(0, 4, size=(4, 64, 64)).astype(np.int32)
    s32, s16 = t32.state, t16.state
    losses32, losses16 = [], []
    for _ in range(5):
        s32, m32 = t32.train_step(s32, img, lbl, t32.base_rng)
        s16, m16 = t16.train_step(s16, img, lbl, t16.base_rng)
        losses32.append(float(m32["loss"]))
        losses16.append(float(m16["loss"]))
    # storage dtypes
    assert jax.tree_util.tree_leaves(s16.params)[0].dtype == jnp.bfloat16
    assert isinstance(s16.opt_state, MasterState)
    assert jax.tree_util.tree_leaves(s16.opt_state.master)[0].dtype == jnp.float32
    # params are exactly the bf16 cast of the master (never drift)
    for p, m in zip(
        jax.tree_util.tree_leaves(s16.params), jax.tree_util.tree_leaves(s16.opt_state.master)
    ):
        if jnp.issubdtype(p.dtype, jnp.floating):
            np.testing.assert_array_equal(np.asarray(p), np.asarray(m.astype(p.dtype)))
    # same trajectory within bf16 rounding noise
    np.testing.assert_allclose(losses16, losses32, rtol=0.02)


@pytest.mark.slow
def test_bf16_params_grad_accum_f32_accumulation():
    """Gradient accumulation under bf16 params sums microbatch grads in f32."""
    t = _dtype_policy_trainer("bfloat16", grad_accum=2)
    r = np.random.default_rng(2)
    img = r.integers(0, 4000, size=(4, 64, 64, 6), dtype=np.int16)
    lbl = r.integers(0, 4, size=(4, 64, 64)).astype(np.int32)
    state, m = t.train_step(t.state, img, lbl, t.base_rng)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_pool_batch_stats_exact():
    """Pooling math: E[x] / Var[x] over the union of equal-size batches."""
    from s2tpu.train.trainer import pool_batch_stats

    rng = np.random.default_rng(0)
    d1 = rng.normal(2.0, 3.0, size=(64, 5)).astype(np.float32)
    d2 = rng.normal(-1.0, 0.5, size=(64, 5)).astype(np.float32)
    stats = [
        {"bn": {"mean": d.mean(0), "var": d.var(0)}} for d in (d1, d2)
    ]
    pooled = pool_batch_stats(stats)
    union = np.concatenate([d1, d2])
    np.testing.assert_allclose(pooled["bn"]["mean"], union.mean(0), rtol=1e-5)
    np.testing.assert_allclose(pooled["bn"]["var"], union.var(0), rtol=1e-4)


@pytest.mark.slow
def test_recalibrate_bn_replaces_running_stats():
    """recalibrate_bn swaps EMA stats for exact pooled stats; eval still runs."""
    t = _dtype_policy_trainer("float32")
    r = np.random.default_rng(3)
    img = r.integers(0, 4000, size=(4, 64, 64, 6), dtype=np.int16)
    lbl = r.integers(0, 4, size=(4, 64, 64)).astype(np.int32)
    state = t.state
    for _ in range(3):
        state, _ = t.train_step(state, img, lbl, t.base_rng)
    t.state = state
    before = jax.tree_util.tree_leaves(t.state.batch_stats)[1]
    t.recalibrate_bn(n_batches=2)
    after_tree = t.state.batch_stats
    after = jax.tree_util.tree_leaves(after_tree)[1]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    for leaf in jax.tree_util.tree_leaves(after_tree):
        assert np.isfinite(np.asarray(leaf)).all()
    # vars are nonnegative
    def vars_of(d):
        for k, v in d.items():
            if isinstance(v, dict):
                if "var" in v and not isinstance(v["var"], dict):
                    yield v["var"]
                else:
                    yield from vars_of(v)
    for v in vars_of(after_tree):
        assert (np.asarray(v) >= 0).all()
    m = t.eval_step(t.state, img, lbl, np.ones(4, np.float32))
    assert np.isfinite(float(m["loss"]))


def test_zero_train_batches_raises(fixture_dir):
    """A dataset smaller than one global batch must fail LOUDLY, not log a
    nan-loss epoch (seg + MAE; the sharded device corpus already asserts)."""
    import pytest as _pytest

    from s2tpu.configs import mae as mae_cfg
    from s2tpu.configs import segmentation as cfg_lib
    from s2tpu.train.mae_trainer import MAETrainer

    c = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    c.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    c.datamodule.batch_size = 64  # > 6-segment fixture's train pool
    c.datamodule.random_crop_size = 64
    c.train.compute_dtype = "float32"
    trainer = SegmentationTrainer(c, Datamodule(c.datamodule), mesh=mesh_lib.make_mesh(1))
    with _pytest.raises(ValueError, match="ZERO"):
        trainer.run_train_epoch(0)

    mc = mae_cfg.base_config(aoi="small")
    mc.train.from_scratch = True
    mc.train.num_devices = 1
    mc.train.compute_dtype = "float32"
    mc.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    mc.datamodule.batch_size = 64
    mc.datamodule.random_crop_size = 32
    from s2tpu.models.prithvi_mae import PrithviConfig

    tiny = PrithviConfig(
        img_size=32, patch_size=16, num_frames=1, in_chans=6, embed_dim=32, depth=1,
        num_heads=2, decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
    )
    mdm = Datamodule(c.datamodule)
    mtr = MAETrainer(mc, mdm, model_config=tiny)
    with _pytest.raises(ValueError, match="ZERO"):
        mtr.run_train_epoch(0)
