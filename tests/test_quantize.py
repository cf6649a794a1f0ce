"""int8 PTQ serving path: quantized layers/models vs float oracles.

Reference has no quantization (inference_demo.py runs fp32); this validates
the TPU serving capability in s2tpu/infer/quantize.py on XLA:CPU (int8
dot/conv are supported there, so numerics are exact-int8, not emulated).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from s2tpu.infer.quantize import (
    ActivationRecorder,
    calibrate_model,
    quantize_weights,
    quantized_apply,
    quantize_segmentation_trainer,
)


def _rel_err(q, f):
    q, f = np.asarray(q, np.float64), np.asarray(f, np.float64)
    return float(np.linalg.norm(q - f) / (np.linalg.norm(f) + 1e-12))


def test_quantized_dense_matches_float(rng):
    model = nn.Dense(64)
    x = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    scales = calibrate_model(model, variables, [x])
    assert len(scales) == 1  # one Dense == one calibrated path
    qstate = quantize_weights(variables["params"], scales)
    out_f = model.apply(variables, x)
    out_q = quantized_apply(model, variables, qstate, x)
    assert _rel_err(out_q, out_f) < 0.02


def test_quantized_conv_strided_padded(rng):
    model = nn.Conv(24, (3, 3), strides=(2, 2), padding="SAME")
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    scales = calibrate_model(model, variables, [x])
    qstate = quantize_weights(variables["params"], scales)
    out_f = model.apply(variables, x)
    out_q = quantized_apply(model, variables, qstate, x)
    assert out_q.shape == out_f.shape
    assert _rel_err(out_q, out_f) < 0.02


@pytest.mark.slow
def test_unet_quantized_forward(rng):
    """B0 UNet: every nn.Dense/nn.Conv runs int8; logits stay close to float
    (per-tensor activation + per-channel weight quant, in-sample ranges)."""
    from s2tpu.models.efficientnet_unet import EfficientNetUNet, EfficientNetUNetConfig

    cfg = EfficientNetUNetConfig(version="b0", in_channels=6, num_classes=4)
    model = EfficientNetUNet(cfg)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 6)).astype(np.float32))
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, train=False))()

    rec = ActivationRecorder()
    with rec.recording():
        model.apply(variables, x, train=False)
    scales = rec.scales()
    assert len(scales) > 20, f"expected many quantizable layers, got {len(scales)}"
    qstate = quantize_weights(variables["params"], scales)
    assert set(qstate) == set(scales)

    out_f = model.apply(variables, x, train=False)
    out_q = jax.jit(lambda v, x: quantized_apply(model, v, qstate, x, train=False))(variables, x)
    err = _rel_err(out_q, out_f)
    assert err < 0.15, f"quantized UNet logits diverged: rel_err={err:.4f}"


@pytest.mark.slow
def test_prithvi_quantized_encoder(rng):
    from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE

    cfg = PrithviConfig(
        img_size=32, patch_size=8, num_frames=1, in_chans=6, embed_dim=64, depth=2,
        num_heads=4, decoder_embed_dim=48, decoder_depth=1, decoder_num_heads=4,
    )
    model = PrithviMAE(cfg)
    x = jnp.asarray(rng.normal(size=(2, 1, 32, 32, 6)).astype(np.float32))
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, mask_ratio=0.0))()

    rec = ActivationRecorder()
    with rec.recording():
        model.apply(variables, x, 0.0, method=PrithviMAE.forward_encoder)
    qstate = quantize_weights(variables["params"], rec.scales())
    assert any("qkv" in p for p in qstate) and any("mlp_fc1" in p for p in qstate)

    out_f, _, _ = model.apply(variables, x, 0.0, method=PrithviMAE.forward_encoder)
    out_q, _, _ = jax.jit(
        lambda v, x: quantized_apply(model, v, qstate, x, 0.0, method=PrithviMAE.forward_encoder)
    )(variables, x)
    err = _rel_err(out_q, out_f)
    assert err < 0.1, f"quantized ViT encoder diverged: rel_err={err:.4f}"


@pytest.mark.slow
def test_prithvi_segmentation_net_quantized(rng):
    """Full fc-prithvi serving model: backbone Denses + FCN nn.Conv quantize;
    the neck's ConvTranspose layers correctly stay float (not in
    QUANT_MODULE_TYPES); logits stay close."""
    from s2tpu.models.prithvi_mae import PrithviConfig
    from s2tpu.models.prithvi_seg import PrithviSegmentationConfig, PrithviSegmentationNet

    backbone = PrithviConfig(
        img_size=32, patch_size=8, num_frames=1, in_chans=6, embed_dim=64, depth=2,
        num_heads=4, decoder_embed_dim=48, decoder_depth=1, decoder_num_heads=4,
    )
    cfg = PrithviSegmentationConfig(
        num_frames=1, num_classes=4, frozen_backbone=False, embed_dim=64,
        patch_height=4, patch_width=4, backbone=backbone, fcn_out_channels=32,
    )
    model = PrithviSegmentationNet(cfg)
    x = jnp.asarray(rng.normal(size=(2, 1, 32, 32, 6)).astype(np.float32))
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, train=False))()

    rec = ActivationRecorder()
    with rec.recording():
        model.apply(variables, x, train=False)
    scales = rec.scales()
    qstate = quantize_weights(variables["params"], scales)
    assert any("qkv" in p for p in qstate), "backbone attention not calibrated"
    assert not any("up" in p.lower() and "transpose" in p.lower() for p in qstate)

    out_f = model.apply(variables, x, train=False)
    out_q = jax.jit(lambda v, x: quantized_apply(model, v, qstate, x, train=False))(variables, x)
    err = _rel_err(out_q, out_f)
    assert err < 0.1, f"quantized fc-prithvi logits diverged: rel_err={err:.4f}"


@pytest.mark.slow
def test_quantized_tiled_serving_end_to_end(tmp_path):
    """quantize_segmentation_trainer -> tiled_predict_many: the full int8
    serving path (calibrate from the datamodule, quantized predict_fn,
    Hann-blended stitching) produces class maps agreeing with the float
    path on high-margin pixels."""
    from s2tpu.configs import segmentation as cfg_lib
    from s2tpu.data.dataset import make_synthetic_fixture
    from s2tpu.data.pipeline import Datamodule
    from s2tpu.infer.tiled import tiled_predict_many
    from s2tpu.parallel import mesh as mesh_lib
    from s2tpu.train.trainer import SegmentationTrainer

    make_synthetic_fixture(tmp_path, aoi="small", label_map="osm-multiclass", n_segments=4, size=(96, 96))
    config = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    config.datamodule.dataset_cfg.data_dir = str(tmp_path)
    config.datamodule.batch_size = 2
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.datamodule.random_crop_size = 64
    config.train.compute_dtype = "float32"
    dm = Datamodule(config.datamodule)
    trainer = SegmentationTrainer(config, dm, mesh=mesh_lib.make_mesh(1))

    predict_q, state = quantize_segmentation_trainer(trainer, n_batches=1)

    from s2tpu.geo.tiff import read_geotiff

    raw, _ = read_geotiff(dm.source.sentinel_files[0])
    imgs = np.ascontiguousarray(raw.transpose(1, 2, 0))[None]
    cm_q, logits_q = tiled_predict_many(
        predict_q, state, imgs, num_classes=config.num_classes, tile=64, return_logits=True
    )
    cm_f, logits_f = tiled_predict_many(
        trainer.predict_step, trainer.state, imgs, num_classes=config.num_classes, tile=64,
        return_logits=True,
    )
    assert cm_q.shape == cm_f.shape
    lf = np.asarray(logits_f[0], np.float32)
    top2 = np.sort(lf, axis=-1)
    margin = top2[..., -1] - top2[..., -2]
    confident = margin > np.quantile(margin, 0.5)
    agree = (np.asarray(cm_q[0]) == np.asarray(cm_f[0]))[confident].mean()
    assert agree > 0.97, f"int8/float class maps disagree on confident pixels: {agree:.3f}"


@pytest.mark.slow
def test_int8_weights_are_runtime_args(tmp_path):
    """The quantized serving program must NOT bake weights as constants:
    one compiled executable (and hence one AOT artifact) serves any
    checkpoint/calibration of the same shapes. Compile once, swap the
    bundle's quantized weights, and the SAME executable must produce
    different logits; --int8 + --aot-cache integration must match the
    uncached run."""
    import jax

    from s2tpu.configs import segmentation as cfg_lib
    from s2tpu.data.dataset import make_synthetic_fixture
    from s2tpu.data.pipeline import Datamodule
    from s2tpu.infer.tiled import tiled_predict_many
    from s2tpu.parallel import mesh as mesh_lib
    from s2tpu.train.trainer import SegmentationTrainer

    make_synthetic_fixture(tmp_path, aoi="small", label_map="osm-multiclass", n_segments=4, size=(96, 96))
    config = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    config.datamodule.dataset_cfg.data_dir = str(tmp_path)
    config.datamodule.batch_size = 2
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.datamodule.random_crop_size = 64
    config.train.compute_dtype = "float32"
    dm = Datamodule(config.datamodule)
    trainer = SegmentationTrainer(config, dm, mesh=mesh_lib.make_mesh(1))

    predict_q, bundle = quantize_segmentation_trainer(trainer, n_batches=1)
    assert set(bundle) == {"state", "qstate"}

    tiles = jnp.asarray(
        np.random.default_rng(0).integers(0, 4000, size=(2, 64, 64, 6)).astype(np.int16)
    )
    compiled = predict_q.lower(bundle, tiles).compile()
    base = np.asarray(compiled(bundle, tiles))

    # same executable, zeroed quantized weights -> different logits
    zeroed = dict(bundle)
    zeroed["qstate"] = jax.tree_util.tree_map(jnp.zeros_like, bundle["qstate"])
    changed = np.asarray(compiled(zeroed, tiles))
    assert not np.allclose(changed, base), "quantized weights were baked into the program"

    # int8 + AOT cache end-to-end (CPU may fall back at dispatch — results
    # must be identical either way)
    from s2tpu.geo.tiff import read_geotiff

    raw, _ = read_geotiff(dm.source.sentinel_files[0])
    imgs = np.ascontiguousarray(raw.transpose(1, 2, 0))[None]
    ref, _ = tiled_predict_many(
        predict_q, bundle, imgs, num_classes=config.num_classes, tile=64
    )
    cache = tmp_path / "int8_tiled.aot"
    for _ in range(2):  # export then load (or clean fallback)
        got, _ = tiled_predict_many(
            predict_q, bundle, imgs, num_classes=config.num_classes, tile=64,
            aot_cache=str(cache),
        )
        assert cache.exists()
        np.testing.assert_array_equal(got, ref)
