"""MAE encoder embedding export: module + CLI + int8 path.

The export serves the pretrain->downstream workflow (reference consumes the
encoder only via PrithviSegmentationNet.forward_encoder(mask_ratio=0.0),
prithvi_segmentation.py:156-162); here the full CLI runs against a real
checkpoint written by the MAE checkpoint manager.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2tpu.configs import mae as mae_cfg
from s2tpu.infer.embed import calibrate_encoder_int8, center_crop, make_embed_fn
from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE


@pytest.fixture(scope="module")
def tiny_mae():
    cfg = PrithviConfig(
        img_size=32, patch_size=16, num_frames=1, in_chans=6, embed_dim=64, depth=2,
        num_heads=4, decoder_embed_dim=48, decoder_depth=1, decoder_num_heads=4,
    )
    model = PrithviMAE(cfg)
    imgs = jnp.zeros((2, 1, 32, 32, 6), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.key(0), imgs, mask_ratio=0.0))()
    return model, variables["params"]


def _mean_std(model):
    c = model.config.in_chans
    return jnp.zeros((c,), jnp.float32) + 100.0, jnp.ones((c,), jnp.float32) * 50.0


def test_embed_pools_shapes_and_semantics(tiny_mae):
    model, params = tiny_mae
    mean, std = _mean_std(model)
    raw = jnp.asarray(np.random.default_rng(0).integers(0, 4000, size=(3, 32, 32, 6)), jnp.float32)

    tokens = make_embed_fn(model, mean, std, pool="tokens")(params, raw)
    cls = make_embed_fn(model, mean, std, pool="cls")(params, raw)
    mean_pool = make_embed_fn(model, mean, std, pool="mean")(params, raw)
    l = (32 // 16) ** 2
    assert tokens.shape == (3, 1 + l, 64)
    assert cls.shape == (3, 64)
    assert mean_pool.shape == (3, 64)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(tokens[:, 0]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mean_pool), np.asarray(tokens[:, 1:]).mean(axis=1), rtol=1e-5, atol=1e-6
    )
    # embeddings are the mask-free encoder tokens (forward_encoder @ ratio 0)
    direct, _, _ = model.apply(
        {"params": params},
        (raw[:, None] - mean) / std,
        0.0,
        method=PrithviMAE.forward_encoder,
    )
    np.testing.assert_allclose(np.asarray(tokens), np.asarray(direct), rtol=1e-5, atol=1e-6)


def test_embed_int8_close_to_float(tiny_mae):
    model, params = tiny_mae
    mean, std = _mean_std(model)
    raw = np.random.default_rng(1).integers(0, 4000, size=(4, 32, 32, 6)).astype(np.float32)

    qstate = calibrate_encoder_int8(model, params, mean, std, [raw])
    assert qstate  # encoder Dense layers got calibrated
    assert not any("decoder" in p for p in qstate)  # encoder-only forward

    f = np.asarray(make_embed_fn(model, mean, std, pool="mean")(params, jnp.asarray(raw)))
    q = np.asarray(
        make_embed_fn(model, mean, std, pool="mean", qstate=qstate)(params, jnp.asarray(raw))
    )
    cos = (f * q).sum(-1) / (np.linalg.norm(f, axis=-1) * np.linalg.norm(q, axis=-1) + 1e-9)
    assert cos.min() > 0.99, f"int8 embeddings diverged: min cos {cos.min()}"


def test_center_crop():
    img = np.arange(6 * 6 * 2).reshape(6, 6, 2)
    out = center_crop(img, 2)
    np.testing.assert_array_equal(out, img[2:4, 2:4, :])
    t = np.stack([img, img])
    assert center_crop(t, 2).shape == (2, 2, 2, 2)


@pytest.mark.slow
def test_export_embeddings_cli(fixture_dir, tmp_path):
    """checkpoint -> CLI -> .npz, float and int8, with a split filter."""
    from s2tpu.checkpoint.orbax_io import CheckpointManager
    from s2tpu.data.dataset import TiffSource
    from s2tpu.data.pipeline import Datamodule
    from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig
    from s2tpu.train.mae_trainer import MAETrainer

    cfg = mae_cfg.base_config(aoi="small")
    cfg.train.from_scratch = True
    cfg.train.num_devices = 1
    cfg.train.compute_dtype = "float32"
    cfg.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    cfg.datamodule.batch_size = 2
    cfg.datamodule.random_crop_size = 32

    src = TiffSource("small", "osm-multiclass", data_dir=fixture_dir, require_labels=False)
    dm = Datamodule(
        DatamoduleConfig(
            dataset_cfg=DatasetConfig(
                aoi="small", label_map="osm-multiclass", data_dir=str(fixture_dir)
            ),
            batch_size=2,
            data_split=(0.5, 0.5, 0.0),
            random_crop_size=32,
        ),
        source=src,
    )
    ckpt_dir = tmp_path / "mae_ckpt"
    mgr = CheckpointManager(ckpt_dir, keep=1, config_dict=dataclasses.asdict(cfg))
    trainer = MAETrainer(cfg, dm, checkpoint_manager=mgr)  # full ViT-B @ crop 32
    mgr.save_epoch(0, trainer.state, metrics={"val/loss": 1.0})
    mgr.wait()
    mgr.close()

    from s2tpu.cli.export_embeddings import main

    out = tmp_path / "emb.npz"
    main([str(ckpt_dir), "--out", str(out), "--bs", "4", "--data-dir", str(fixture_dir)])
    z = np.load(out)
    n_segments = len(src)
    assert z["embeddings"].shape == (n_segments, 768)
    assert len(z["segment_ids"]) == n_segments
    meta = json.loads(str(z["meta"]))
    assert meta["pool"] == "mean" and meta["crop"] == 32 and not meta["int8"]

    out8 = tmp_path / "emb_int8.npz"
    main([
        str(ckpt_dir), "--out", str(out8), "--bs", "4", "--int8",
        "--calib-batches", "1", "--data-dir", str(fixture_dir),
    ])
    z8 = np.load(out8)
    f, q = z["embeddings"], z8["embeddings"]
    cos = (f * q).sum(-1) / (np.linalg.norm(f, axis=-1) * np.linalg.norm(q, axis=-1) + 1e-9)
    assert cos.min() > 0.98

    out_val = tmp_path / "emb_val.npz"
    main([
        str(ckpt_dir), "--out", str(out_val), "--split", "val", "--pool", "tokens",
        "--data-dir", str(fixture_dir),
    ])
    zv = np.load(out_val)
    assert zv["embeddings"].shape[0] < n_segments  # split filter applied
    assert zv["embeddings"].ndim == 3  # (N, 1+L, D) token export

    # linear probe over the exported embeddings (downstream MAE evaluation)
    import contextlib
    import io

    from s2tpu.cli.probe_embeddings import main as probe_main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe_main([str(out), "--data-dir", str(fixture_dir), "--steps", "200"])
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rec["n_segments"] == n_segments
    assert rec["num_classes"] == 4
    assert 0.0 <= rec["eval_acc"] <= 1.0 and 0.0 <= rec["majority_baseline"] <= 1.0
    # a 768-d logistic probe must at least fit its handful of train segments
    assert rec["train_acc"] >= 0.5
