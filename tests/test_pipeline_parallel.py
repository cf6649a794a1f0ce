"""Pipeline parallelism: GPipe schedule over ViT blocks matches sequential.

Reference has no pipeline support (Lightning `devices` unused — SURVEY.md §2);
this exercises the TPU-native pp axis: stage-sharded stacked block params,
ppermute activation rotation, microbatch schedule, forward AND backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.parallel.pipeline import (
    pipelined_block_apply,
    prithvi_pipelined_decode,
    prithvi_pipelined_encode,
    prithvi_pipelined_mae_forward,
    stack_block_params,
)

BASE = dict(
    img_size=32, patch_size=8, num_frames=1, in_chans=6, embed_dim=64, depth=4,
    num_heads=4, decoder_embed_dim=48, decoder_depth=2, decoder_num_heads=4,
)


@pytest.fixture(scope="module")
def vit():
    model = PrithviMAE(PrithviConfig(**BASE))
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 1, 32, 32, 6)).astype(np.float32)
    )
    variables = jax.jit(lambda: model.init(jax.random.key(0), imgs, mask_ratio=0.0))()
    return model, variables, imgs


@pytest.mark.parametrize("n_micro,pipe", [(1, 4), (4, 4), (2, 2)])
def test_pipelined_encoder_matches_sequential(vit, n_micro, pipe):
    model, variables, imgs = vit
    mesh = mesh_lib.make_mesh(8, model_parallel=pipe)

    seq, mask_s, ids_s = jax.jit(
        lambda v, x: model.apply(v, x, 0.0, method=PrithviMAE.forward_encoder)
    )(variables, imgs)

    @jax.jit
    def pp(v, x):
        return prithvi_pipelined_encode(
            model, v, x, mesh=mesh, n_microbatches=n_micro, mask_ratio=0.0
        )

    with jax.set_mesh(mesh):
        out, mask_p, ids_p = pp(variables, jax.device_put(imgs, mesh_lib.data_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_s))


def test_pipelined_encoder_grads_match_sequential(vit):
    """Backward through the pipeline (scan + ppermute transpose) must produce
    the same parameter gradients as the sequential encoder — the gate for
    using pp in training, not just inference."""
    model, variables, imgs = vit
    mesh = mesh_lib.make_mesh(8, model_parallel=4)
    cot = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 17, 64)).astype(np.float32)
    )

    def loss_seq(v, x):
        out, _, _ = model.apply(v, x, 0.0, method=PrithviMAE.forward_encoder)
        return (out * cot).sum()

    def loss_pp(v, x):
        out, _, _ = prithvi_pipelined_encode(
            model, v, x, mesh=mesh, n_microbatches=2, mask_ratio=0.0
        )
        return (out * cot).sum()

    g_seq = jax.jit(jax.grad(loss_seq))(variables, imgs)
    with jax.set_mesh(mesh):
        g_pp = jax.jit(jax.grad(loss_pp))(
            variables, jax.device_put(imgs, mesh_lib.data_sharding(mesh))
        )
    flat_s = jax.tree_util.tree_leaves_with_path(g_seq)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_pp))
    for path, leaf_s in flat_s:
        leaf_p = flat_p[path]
        np.testing.assert_allclose(
            np.asarray(leaf_p), np.asarray(leaf_s), rtol=2e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipelined_masked_encoder(vit):
    """Masking upstream of the pipeline: same rng -> same kept tokens, and
    the pipelined masked encoder matches the sequential one."""
    model, variables, imgs = vit
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    rng = jax.random.key(7)
    seq, mask_s, ids_s = jax.jit(
        lambda v, x: model.apply(v, x, 0.5, rng, method=PrithviMAE.forward_encoder)
    )(variables, imgs)
    with jax.set_mesh(mesh):
        out, mask_p, ids_p = jax.jit(
            lambda v, x: prithvi_pipelined_encode(
                model, v, x, mesh=mesh, n_microbatches=2, mask_ratio=0.5, mask_rng=rng
            )
        )(variables, jax.device_put(imgs, mesh_lib.data_sharding(mesh)))
    np.testing.assert_array_equal(np.asarray(mask_p), np.asarray(mask_s))
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_micro,pipe", [(1, 2), (2, 2)])
def test_pipelined_decoder_matches_sequential(vit, n_micro, pipe):
    """decoder_block_* stack as pipe stages (different width/heads than the
    encoder) — pred must match the sequential forward_decoder."""
    model, variables, imgs = vit
    mesh = mesh_lib.make_mesh(8, model_parallel=pipe)
    rng = jax.random.key(3)

    latent, _, ids = jax.jit(
        lambda v, x: model.apply(v, x, 0.5, rng, method=PrithviMAE.forward_encoder)
    )(variables, imgs)
    seq = jax.jit(
        lambda v, t, i: model.apply(v, t, i, method=PrithviMAE.forward_decoder)
    )(variables, latent, ids)

    with jax.set_mesh(mesh):
        pp = jax.jit(
            lambda v, t, i: prithvi_pipelined_decode(
                model, v, t, i, mesh=mesh, n_microbatches=n_micro
            )
        )(
            variables,
            jax.device_put(latent, mesh_lib.data_sharding(mesh)),
            jax.device_put(ids, mesh_lib.data_sharding(mesh)),
        )
    np.testing.assert_allclose(np.asarray(pp), np.asarray(seq), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pipelined_mae_forward_full_matches_sequential(vit):
    """Full MAE forward with BOTH stacks pipelined (stages=2 divides depth=4
    and decoder_depth=2): loss/pred/mask and parameter grads must match the
    sequential __call__."""
    model, variables, imgs = vit
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    rng = jax.random.key(11)

    loss_s, pred_s, mask_s = jax.jit(lambda v, x: model.apply(v, x, 0.75, rng))(variables, imgs)

    def pp_fwd(v, x):
        return prithvi_pipelined_mae_forward(
            model, v, x, mesh=mesh, n_microbatches=2, mask_ratio=0.75, mask_rng=rng
        )

    with jax.set_mesh(mesh):
        x_sh = jax.device_put(imgs, mesh_lib.data_sharding(mesh))
        loss_p, pred_p, mask_p = jax.jit(pp_fwd)(variables, x_sh)
        g_pp = jax.jit(jax.grad(lambda v, x: pp_fwd(v, x)[0]))(variables, x_sh)
    np.testing.assert_array_equal(np.asarray(mask_p), np.asarray(mask_s))
    np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_p), np.asarray(pred_s), rtol=1e-4, atol=1e-5)

    g_seq = jax.jit(jax.grad(lambda v, x: model.apply(v, x, 0.75, rng)[0]))(variables, imgs)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_pp))
    for path, leaf_s in jax.tree_util.tree_leaves_with_path(g_seq):
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(leaf_s), rtol=2e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipelined_mae_forward_indivisible_decoder_falls_back(vit):
    """stages=4 divides depth=4 but not decoder_depth=2 — the decoder must
    fall back to the sequential path and still match end to end."""
    model, variables, imgs = vit
    mesh = mesh_lib.make_mesh(8, model_parallel=4)
    assert BASE["decoder_depth"] % 4 != 0
    rng = jax.random.key(5)
    loss_s, pred_s, _ = jax.jit(lambda v, x: model.apply(v, x, 0.75, rng))(variables, imgs)
    with jax.set_mesh(mesh):
        loss_p, pred_p, _ = jax.jit(
            lambda v, x: prithvi_pipelined_mae_forward(
                model, v, x, mesh=mesh, n_microbatches=2, mask_ratio=0.75, mask_rng=rng
            )
        )(variables, jax.device_put(imgs, mesh_lib.data_sharding(mesh)))
    np.testing.assert_allclose(float(loss_p), float(loss_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_p), np.asarray(pred_s), rtol=1e-4, atol=1e-5)


def test_stack_block_params_roundtrip(vit):
    model, variables, _ = vit
    stacked = stack_block_params(variables["params"], "block_", BASE["depth"])
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.shape[0] == BASE["depth"]
    # stage 2's slice must equal block_2's original leaf
    k2 = variables["params"]["block_2"]["attn"]["qkv"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(stacked["attn"]["qkv"]["kernel"][2]), np.asarray(k2)
    )


@pytest.mark.slow
def test_mae_train_step_pipelined_matches_sequential(tmp_path):
    """Full MAE train step with pipeline_stages=2: loss and updated params
    must match the sequential trainer bit-for-near (same seeds, same data) —
    pp is a pure execution strategy, not a different optimization."""
    from s2tpu.configs import mae as mae_cfg
    from s2tpu.data.dataset import TiffSource, make_synthetic_fixture
    from s2tpu.data.pipeline import Datamodule
    from s2tpu.train.mae_trainer import MAETrainer

    make_synthetic_fixture(tmp_path, aoi="small", label_map="osm-multiclass", n_segments=4, size=(32, 32))

    from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig

    def build(pp: int) -> MAETrainer:
        cfg = mae_cfg.base_config(aoi="small")
        cfg.train.from_scratch = True
        cfg.train.num_devices = 4 if pp > 1 else 2
        cfg.train.compute_dtype = "float32"
        cfg.datamodule.batch_size = 4
        cfg.datamodule.random_crop_size = 32
        cfg.model.pipeline_stages = pp
        cfg.model.pipeline_microbatches = 2
        # decoder_depth=2 so the pp=2 leg pipelines the decoder stack too
        tiny = PrithviConfig(
            img_size=32, patch_size=8, num_frames=1, in_chans=6, embed_dim=64, depth=2,
            num_heads=4, decoder_embed_dim=48, decoder_depth=2, decoder_num_heads=4,
        )
        src = TiffSource("small", "osm-multiclass", data_dir=tmp_path, require_labels=False)
        dm = Datamodule(
            DatamoduleConfig(
                dataset_cfg=DatasetConfig(
                    aoi="small", label_map="osm-multiclass", data_dir=str(tmp_path)
                ),
                batch_size=4,
                data_split=(1.0, 0.0, 0.0),
                random_crop_size=32,
            ),
            source=src,
        )
        return MAETrainer(cfg, dm, model_config=tiny)

    t_seq = build(1)
    t_pp = build(2)
    assert dict(t_pp.mesh.shape) == {"data": 2, "model": 2}
    # identical init (same seed) — verify, then run one identical step
    for a, b in zip(
        jax.tree_util.tree_leaves(t_seq.state.params), jax.tree_util.tree_leaves(t_pp.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    images = jnp.asarray(
        np.random.default_rng(3).integers(0, 4000, size=(4, 32, 32, 6)).astype(np.int16)
    )
    s_seq, m_seq = t_seq.train_step(
        t_seq.state, jax.device_put(images, mesh_lib.data_sharding(t_seq.mesh)), t_seq.base_rng
    )
    with jax.set_mesh(t_pp.mesh):
        s_pp, m_pp = t_pp.train_step(
            t_pp.state, jax.device_put(images, mesh_lib.data_sharding(t_pp.mesh)), t_pp.base_rng
        )
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_seq["loss"]), rtol=1e-5)
    # Updated params: grads agree to float-reduction order, but Adam divides
    # by sqrt(v)+eps at step 1, amplifying ~1e-7 grad noise to ~1e-5 on the
    # ~lr-sized updates — compare absolutely at that scale.
    flat_seq = dict(jax.tree_util.tree_leaves_with_path(s_seq.params))
    for path, leaf_pp in jax.tree_util.tree_leaves_with_path(s_pp.params):
        np.testing.assert_allclose(
            np.asarray(leaf_pp), np.asarray(flat_seq[path]), rtol=2e-3, atol=3e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipeline_rejects_tp_combination(vit):
    _, variables, imgs = vit
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    model_tp = PrithviMAE(PrithviConfig(**BASE, tp_axis=mesh_lib.MODEL_AXIS))
    with pytest.raises(AssertionError, match="model"):
        prithvi_pipelined_encode(
            model_tp, variables, imgs, mesh=mesh, n_microbatches=2
        )


def test_pipeline_rejects_indivisible_depth(vit):
    model, variables, imgs = vit
    # depth=4 over 8 pipeline stages -> error
    mesh = mesh_lib.make_mesh(8, model_parallel=8)
    with pytest.raises(AssertionError, match="divisible"):
        prithvi_pipelined_encode(model, variables, imgs, mesh=mesh, n_microbatches=2)
