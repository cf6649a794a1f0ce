"""Tensor-parallel ViT: sharded attention/MLP matches the unsharded model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE
from s2tpu.parallel import mesh as mesh_lib


def test_tp_vit_matches_unsharded(rng):
    base = dict(
        img_size=32, patch_size=8, num_frames=1, in_chans=6, embed_dim=64, depth=2,
        num_heads=4, decoder_embed_dim=48, decoder_depth=1, decoder_num_heads=4,
    )
    cfg_plain = PrithviConfig(**base)
    cfg_tp = PrithviConfig(**base, tp_axis=mesh_lib.MODEL_AXIS)

    imgs = jnp.asarray(rng.normal(size=(4, 1, 32, 32, 6)).astype(np.float32))
    model_plain = PrithviMAE(cfg_plain)
    variables = jax.jit(lambda: model_plain.init(jax.random.key(0), imgs, mask_ratio=0.0))()

    loss_plain, _, _ = jax.jit(lambda v, x: model_plain.apply(v, x, mask_ratio=0.0))(variables, imgs)

    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    with jax.set_mesh(mesh):
        model_tp = PrithviMAE(cfg_tp)
        sharded_imgs = jax.device_put(imgs, mesh_lib.data_sharding(mesh))
        sharded_vars = mesh_lib.replicate_pytree(variables, mesh)
        loss_tp, pred_tp, _ = jax.jit(lambda v, x: model_tp.apply(v, x, mask_ratio=0.0))(
            sharded_vars, sharded_imgs
        )
        # mask_ratio=0 -> loss is 0/0-guarded to 0 for both; compare predictions
        _, pred_plain, _ = jax.jit(lambda v, x: model_plain.apply(v, x, mask_ratio=0.0))(
            variables, imgs
        )
        np.testing.assert_allclose(
            np.asarray(pred_tp), np.asarray(pred_plain), rtol=1e-4, atol=1e-5
        )


def test_tp_train_step_runs(rng, tmp_path):
    """Full MAE train step under (data=4, model=2) with tp constraints."""
    from s2tpu.configs import mae as mae_cfg
    from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig
    from s2tpu.data.dataset import TiffSource, make_synthetic_fixture
    from s2tpu.data.pipeline import Datamodule
    from s2tpu.train.mae_trainer import MAETrainer

    make_synthetic_fixture(tmp_path, aoi="small", label_map="osm-multiclass", n_segments=4, size=(32, 32))
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    with jax.set_mesh(mesh):
        cfg = mae_cfg.base_config(aoi="small")
        cfg.train.from_scratch = True
        cfg.datamodule.batch_size = 4
        cfg.datamodule.random_crop_size = 32
        tiny = PrithviConfig(
            img_size=32, patch_size=8, num_frames=1, in_chans=6, embed_dim=64, depth=1,
            num_heads=4, decoder_embed_dim=48, decoder_depth=1, decoder_num_heads=4,
            tp_axis=mesh_lib.MODEL_AXIS,
        )
        source = TiffSource("small", "osm-multiclass", data_dir=tmp_path, require_labels=False)
        dm = Datamodule(
            DatamoduleConfig(
                dataset_cfg=DatasetConfig(aoi="small", label_map="osm-multiclass", data_dir=str(tmp_path)),
                batch_size=4,
                data_split=(1.0, 0.0, 0.0),
                random_crop_size=32,
            ),
            source=source,
        )
        trainer = MAETrainer(cfg, dm, mesh=mesh, model_config=tiny)
        batch = next(iter(dm.train_batches(epoch=0)))
        images = jax.device_put(batch.images, mesh_lib.data_sharding(mesh))
        state, m = trainer.train_step(trainer.state, images, trainer.base_rng)
        assert np.isfinite(float(m["loss"]))
        assert int(state.step) == 1


@pytest.mark.slow
def test_tp_compile_has_no_remat_warnings(tmp_path):
    """The TP train step must compile without '[SPMD] Involuntary full
    rematerialization' (r1 regression: constraints omitted the data axis,
    forcing the partitioner to replicate activations)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    script = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        cwd=repo,
        env={"PYTHONPATH": str(repo), "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": str(tmp_path)},
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "rematerialization" not in proc.stderr, proc.stderr[-3000:]
