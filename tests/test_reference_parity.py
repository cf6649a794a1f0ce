"""End-to-end numerical parity vs the reference PyTorch models run in-process.

The real pretrained checkpoints are not present in this image
(/root/reference/weights/ is empty), so the strongest available oracle is the
reference *model code itself*: instantiate the torch modules with seeded
random weights, push their state dicts through s2tpu.checkpoint.convert_torch,
and require the Flax models to reproduce the torch outputs — including the
BASELINE.md north-star check that argmax class maps match exactly.

These tests exercise the identical code path a real Prithvi_100M.pt /
trained reference checkpoint would take (same file format, same naming, same
surgery); only the weight values differ.

Reference quirk found while building this (documented, NOT replicated):
``random_masking`` shuffles tokens even at mask_ratio=0.0
(prithvi.py:258-283), and PrithviSegmentationNet consumes the encoder tokens
without unshuffling (prithvi_segmentation.py:156-162) — the reference seg
head sees randomly permuted spatial tokens. The MAE ``pred`` is unaffected
(the decoder unshuffles via ids_restore), so MAE comparisons are exact; for
encoder-token comparisons we unshuffle the reference output with its
returned ids_restore.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.reference_loader import REFERENCE_ROOT, load_reference_modules  # noqa: E402

pytestmark = pytest.mark.skipif(
    not pathlib.Path(REFERENCE_ROOT, "src").exists(),
    reason="reference checkout not present (parity oracle unavailable)",
)

from s2tpu.checkpoint.convert_torch import (  # noqa: E402
    convert_prithvi_state_dict,
    convert_reference_prithvi_seg_state_dict,
    convert_reference_unet_state_dict,
    load_prithvi_weights,
)


@pytest.fixture(scope="module")
def ref():
    return load_reference_modules()


@pytest.fixture(autouse=True)
def _exact_matmuls():
    # Default CPU matmul precision is lowered; parity needs exact f32 ops.
    with jax.default_matmul_precision("highest"):
        yield


# ---------------------------------------------------------------------------
# EfficientNet-UNet: full model, logits + bit-for-bit argmax
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_unet_b0_full_model_parity(ref):
    eu = ref["efficientnet_unet"]
    torch.manual_seed(0)
    dist = [0.1, 0.2, 0.3, 0.4]
    tmodel = eu.EfficientnetUnet(
        eu.EfficientNetConfig(version="b0", num_classes=4, in_channels=6, class_distribution=dist)
    )
    tmodel.eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 224, 224, 6)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    from s2tpu.models.efficientnet_unet import EfficientNetUNet, EfficientNetUNetConfig

    model = EfficientNetUNet(
        EfficientNetUNetConfig(version="b0", in_channels=6, num_classes=4, class_distribution=dist)
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 6)), train=False)
    params, stats = convert_reference_unet_state_dict(tmodel.state_dict())
    from s2tpu.checkpoint.convert_torch import _merge_into

    params = _merge_into(variables["params"], params)
    stats = _merge_into(variables["batch_stats"], stats)
    j_logits = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    )

    assert j_logits.shape == t_logits.shape
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-3, atol=2e-4)
    # North star: bit-for-bit class maps (BASELINE.md output-parity row).
    np.testing.assert_array_equal(j_logits.argmax(-1), t_logits.argmax(-1))


def test_unet_conversion_covers_all_reference_weights(ref):
    """Every reference tensor must land in the converted tree (nothing
    silently dropped) except num_batches_tracked counters and the unused
    ImageNet fc head."""
    eu = ref["efficientnet_unet"]
    torch.manual_seed(1)
    tmodel = eu.EfficientnetUnet(
        eu.EfficientNetConfig(version="b1", num_classes=3, in_channels=6, class_distribution=[0.3, 0.3, 0.4])
    )
    sd = tmodel.state_dict()
    params, stats = convert_reference_unet_state_dict(sd)

    def count_leaves(tree) -> int:
        return len(jax.tree_util.tree_leaves(tree))

    expected = len(
        [
            k
            for k in sd
            if "num_batches_tracked" not in k
            and "running_" not in k
            and not k.startswith("encoder.fc.")
        ]
    )
    running = len([k for k in sd if "running_" in k])
    assert count_leaves(params) == expected
    assert count_leaves(stats) == running


# ---------------------------------------------------------------------------
# Prithvi MAE: full forward (pred) parity at mask_ratio=0 (deterministic)
# ---------------------------------------------------------------------------
def _tiny_args():
    return dict(
        img_size=32,
        patch_size=16,
        num_frames=1,
        tubelet_size=1,
        in_chans=6,
        embed_dim=64,
        depth=2,
        num_heads=4,
        decoder_embed_dim=32,
        decoder_depth=2,
        decoder_num_heads=4,
    )


@pytest.mark.slow
def test_prithvi_mae_pred_parity(ref):
    pr = ref["prithvi"]
    args = _tiny_args()
    torch.manual_seed(0)
    tmodel = pr.MaskedAutoencoderViT(**args)
    tmodel.eval()

    from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE

    cfg = PrithviConfig.from_model_args(args)
    model = PrithviMAE(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, args["num_frames"], args["img_size"], args["img_size"], args["in_chans"])).astype(
        np.float32
    )
    with torch.no_grad():
        _, t_pred, t_mask = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), mask_ratio=0.0)

    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), mask_ratio=0.0)
    params = _merge(variables["params"], convert_prithvi_state_dict(tmodel.state_dict()))
    _, j_pred, j_mask = model.apply({"params": params}, jnp.asarray(x), mask_ratio=0.0)

    assert np.asarray(j_mask).sum() == 0 and t_mask.numpy().sum() == 0
    np.testing.assert_allclose(np.asarray(j_pred), t_pred.numpy(), rtol=1e-3, atol=2e-5)


def _merge(template, converted):
    from s2tpu.checkpoint.convert_torch import _merge_into

    return _merge_into(template, converted)


def test_prithvi_pos_embed_matches_reference(ref):
    pr = ref["prithvi"]
    ours_mod = __import__("s2tpu.models.prithvi_mae", fromlist=["sincos_3d"])
    for grid in [(1, 14, 14), (3, 14, 14), (1, 2, 2)]:
        theirs = pr.get_3d_sincos_pos_embed(768, grid, cls_token=True)
        ours = ours_mod.sincos_3d(768, grid, cls_token=True)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


# ---------------------------------------------------------------------------
# Full PrithviSegmentationNet (backbone + neck + FCN head) parity
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_prithvi_seg_full_net_parity(ref, monkeypatch):
    """The full reference PrithviSegmentationNet vs s2tpu, weights converted
    through convert_reference_prithvi_seg_state_dict — the finetuned-checkpoint
    ingestion path (reference prithvi_segmentation.py:132-162).

    Tiny dims (the converter and both models are size-agnostic; full-scale
    backbone conversion is covered by test_prithvi_checkpoint_surgery_parity).
    The reference forward consumes SHUFFLED encoder tokens (the mask_ratio=0
    quirk documented above), so the reference pipeline is composed manually
    with the ids_restore unshuffle before neck+head; argmax maps must match
    bit-for-bit."""
    pr = ref["prithvi"]
    ps = ref["prithvi_segmentation"]
    args = _tiny_args()
    torch.manual_seed(0)
    tiny_backbone = pr.MaskedAutoencoderViT(**args)
    monkeypatch.setattr(ps, "load_prithvi", lambda num_frames: tiny_backbone)

    tcfg = ps.PrithviSegmentationNetConfig(
        num_frames=1, num_classes=4, fcn_out_channels=32, fcn_num_convs=2,
        fcn_dropout=0.1, frozen_backbone=True, embed_dim=args["embed_dim"],
        patch_height=2, patch_width=2,
    )
    tnet = ps.PrithviSegmentationNet(tcfg)
    tnet.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, args["img_size"], args["img_size"], args["in_chans"])).astype(
        np.float32
    )
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
        feats, _, ids_restore = tnet.backbone.forward_encoder(tx, mask_ratio=0.0)
        # Unshuffle the ratio=0 token permutation before the spatial reshape.
        patches = torch.stack([feats[b, 1:][ids_restore[b]] for b in range(feats.shape[0])])
        feats = torch.cat([feats[:, :1], patches], dim=1)
        t_logits = tnet.head(tnet.neck(feats)).numpy().transpose(0, 2, 3, 1)

    from s2tpu.models.prithvi_mae import PrithviConfig
    from s2tpu.models.prithvi_seg import PrithviSegmentationConfig, PrithviSegmentationNet

    cfg = PrithviSegmentationConfig(
        num_frames=1, num_classes=4, fcn_out_channels=32, fcn_num_convs=2,
        fcn_dropout=0.1, frozen_backbone=True, embed_dim=args["embed_dim"],
        patch_height=2, patch_width=2, backbone=PrithviConfig.from_model_args(args),
    )
    model = PrithviSegmentationNet(cfg)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    params, stats = convert_reference_prithvi_seg_state_dict(tnet.state_dict())
    params = _merge(variables["params"], params)
    stats = _merge(variables["batch_stats"], stats)
    j_logits = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    )

    assert j_logits.shape == t_logits.shape
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-3, atol=1e-4)
    # North star: bit-for-bit class maps (BASELINE.md output-parity row).
    np.testing.assert_array_equal(j_logits.argmax(-1), t_logits.argmax(-1))


def test_prithvi_seg_conversion_covers_all_reference_weights(ref, monkeypatch):
    """Every neck/head tensor lands in the converted tree (backbone pos
    embeds excluded by design; BN counters excluded)."""
    pr = ref["prithvi"]
    ps = ref["prithvi_segmentation"]
    args = _tiny_args()
    torch.manual_seed(1)
    monkeypatch.setattr(ps, "load_prithvi", lambda num_frames: pr.MaskedAutoencoderViT(**args))
    tnet = ps.PrithviSegmentationNet(
        ps.PrithviSegmentationNetConfig(
            num_frames=1, num_classes=3, fcn_out_channels=16, fcn_num_convs=1,
            fcn_dropout=0.0, frozen_backbone=False, embed_dim=args["embed_dim"],
            patch_height=2, patch_width=2,
        )
    )
    sd = tnet.state_dict()
    params, stats = convert_reference_prithvi_seg_state_dict(sd)

    def leaves(tree) -> int:
        return len(jax.tree_util.tree_leaves(tree))

    expected = len(
        [
            k
            for k in sd
            if "num_batches_tracked" not in k
            and "running_" not in k
            and "pos_embed" not in k
            # decoder dropped by the seg converter (forward_encoder only)
            and not k.startswith(("backbone.decoder_", "backbone.mask_token"))
        ]
    )
    running = len([k for k in sd if "running_" in k])
    assert leaves(params) == expected
    assert leaves(stats) == running


# ---------------------------------------------------------------------------
# Checkpoint-surgery parity: the exact load path Prithvi_100M.pt would take
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_prithvi_checkpoint_surgery_parity(ref, tmp_path, monkeypatch):
    """Write a .pt with the real Prithvi_100M architecture (random values,
    num_frames=3 like the published checkpoint), load it through BOTH the
    reference's load_prithvi surgery (num_frames=1, decoder dropped,
    pos-embed regenerated) and s2tpu's converter, and require identical
    encoder tokens. Same format, same path — only the values are synthetic
    (the real file is absent from this image)."""
    pr = ref["prithvi"]
    import importlib

    utils = importlib.import_module("utils")

    from s2tpu.utils import load_prithvi_model_args

    args = load_prithvi_model_args()
    torch.manual_seed(0)
    full = pr.MaskedAutoencoderViT(**{**args, "num_frames": 3})
    ckpt_path = tmp_path / "Prithvi_100M.pt"
    torch.save(full.state_dict(), ckpt_path)

    monkeypatch.setattr(utils, "PRITHVI_WEIGHTS", ckpt_path, raising=True)
    tmodel = utils.load_prithvi(num_frames=1, no_decoder=True)
    tmodel.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1, 224, 224, 6)).astype(np.float32)
    with torch.no_grad():
        t_tokens, _, ids_restore = tmodel.forward_encoder(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), mask_ratio=0.0
        )
    t_tokens = t_tokens.numpy()
    # Reference quirk: ratio=0 still shuffles tokens — unshuffle for comparison.
    restore = ids_restore.numpy()[0]
    t_patches = t_tokens[:, 1:][:, restore]

    from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE

    cfg = PrithviConfig.from_model_args(args, num_frames=1)
    model = PrithviMAE(cfg)
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), mask_ratio=0.0)
    params = load_prithvi_weights(
        variables["params"], num_frames=1, path=ckpt_path, include_decoder=False
    )

    def encode(p, imgs):
        return model.apply({"params": p}, imgs, method=lambda m, i: m.forward_encoder(i, 0.0))

    j_tokens, _, _ = encode(params, jnp.asarray(x))
    j_tokens = np.asarray(j_tokens)

    np.testing.assert_allclose(j_tokens[:, :1], t_tokens[:, :1], rtol=1e-3, atol=3e-5)  # cls
    np.testing.assert_allclose(j_tokens[:, 1:], t_patches, rtol=1e-3, atol=3e-5)


# ---------------------------------------------------------------------------
# import-ckpt CLI: trained Lightning .ckpt -> servable s2tpu checkpoint dir
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_import_ckpt_cli_unet(ref, tmp_path):
    """End-to-end migration path: save a reference Lightning checkpoint
    (``net.``-prefixed state dict — reference train_segmentation.py:247-255),
    run ``convert_weights import-ckpt``, and serve from the produced
    directory exactly the way ``cli/infer.py`` does (config.json -> Config,
    Orbax restore -> apply). Requires bit-for-bit argmax parity with the
    reference torch model."""
    eu = ref["efficientnet_unet"]
    from s2tpu.configs.data_config import LABEL_MAPS

    k = LABEL_MAPS["osm-multiclass"].num_classes
    torch.manual_seed(0)
    dist = [(i + 1) / (k * (k + 1) / 2) for i in range(k)]
    tmodel = eu.EfficientnetUnet(
        eu.EfficientNetConfig(version="b0", num_classes=k, in_channels=6, class_distribution=dist)
    )
    tmodel.eval()
    ckpt_path = tmp_path / "ref_b0.ckpt"
    torch.save(
        {"state_dict": {f"net.{n}": v for n, v in tmodel.state_dict().items()}}, ckpt_path
    )

    out = tmp_path / "imported"
    from s2tpu.cli.convert_weights import main as convert_main

    convert_main(
        [
            "import-ckpt", str(ckpt_path),
            "--model", "efficientnet-unet-b0",
            "--aoi", "at", "--labels", "osm-multiclass",
            "--out", str(out),
        ]
    )

    # Serve from the imported directory via the infer CLI's own config path.
    from s2tpu.checkpoint.orbax_io import CheckpointManager
    from s2tpu.cli.infer import _config_from_dict

    mgr = CheckpointManager(out)
    cfg = _config_from_dict(mgr.load_config())
    assert cfg.model_name.value == "efficientnet-unet-b0"
    assert cfg.num_classes == k
    raw = mgr.restore_raw(0)
    mgr.close()
    assert int(raw["step"]) == 0
    assert isinstance(raw["opt_state"], list) and len(raw["opt_state"]) > 0

    model = cfg.build_model(dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 224, 224, 6)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    j_logits = np.asarray(
        model.apply(
            {"params": raw["params"], "batch_stats": raw["batch_stats"]},
            jnp.asarray(x),
            train=False,
        )
    )
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-3, atol=2e-4)
    np.testing.assert_array_equal(j_logits.argmax(-1), t_logits.argmax(-1))


# ---------------------------------------------------------------------------
# Reverse migration: Flax -> torch export (bit-exact roundtrips, strict load)
# ---------------------------------------------------------------------------
def test_export_unet_roundtrip(ref):
    """torch -> s2tpu -> torch is bit-exact and strict-loadable: every tensor
    of the reference EfficientnetUnet round-trips through the converter pair
    (convert_reference_unet_state_dict / export_reference_unet_state_dict)."""
    eu = ref["efficientnet_unet"]
    torch.manual_seed(3)
    dist = [0.1, 0.2, 0.3, 0.4]
    tmodel = eu.EfficientnetUnet(
        eu.EfficientNetConfig(version="b0", num_classes=4, in_channels=6, class_distribution=dist)
    )
    sd = tmodel.state_dict()
    from s2tpu.checkpoint.convert_torch import export_reference_unet_state_dict

    params, stats = convert_reference_unet_state_dict(sd)
    back = export_reference_unet_state_dict(params, stats)

    # The UNet never uses the encoder's ImageNet fc head — the only tensors
    # absent from the export (the reference itself loads these strict=False).
    missing = set(sd.keys()) - set(back)
    assert all(k.startswith("encoder.fc.") for k in missing), missing
    assert set(back) - set(sd.keys()) == set()
    for k, v in back.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(v, sd[k].numpy(), err_msg=k)
    # load proves key + shape + dtype coverage end-to-end (fc head aside)
    res = tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in back.items()}, strict=False
    )
    assert res.unexpected_keys == []
    assert all(k.startswith("encoder.fc.") for k in res.missing_keys)


def test_export_prithvi_roundtrip(ref):
    """torch -> s2tpu -> torch for the MAE (tiny dims): learned tensors
    round-trip bit-exact; the regenerated sincos pos embeds match the torch
    model's own tables; the result strict-loads."""
    pr = ref["prithvi"]
    args = _tiny_args()
    torch.manual_seed(4)
    tmodel = pr.MaskedAutoencoderViT(**args)
    sd = tmodel.state_dict()

    from s2tpu.checkpoint.convert_torch import export_prithvi_state_dict
    from s2tpu.models.prithvi_mae import PrithviConfig

    params = convert_prithvi_state_dict(sd)
    back = export_prithvi_state_dict(params, PrithviConfig.from_model_args(args))

    assert set(back) == set(sd.keys())
    for k, v in sd.items():
        if k in ("pos_embed", "decoder_pos_embed"):
            np.testing.assert_allclose(back[k], v.numpy(), atol=1e-6, err_msg=k)
        else:
            np.testing.assert_array_equal(back[k], v.numpy(), err_msg=k)
    tmodel.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in back.items()}, strict=True)


def test_export_prithvi_seg_roundtrip(ref, monkeypatch):
    """torch -> s2tpu -> torch for the full segmentation net (tiny dims):
    learned tensors round-trip bit-exact; regenerated backbone pos embeds
    match; the export loads back with only decoder-side keys missing (the
    reference's own load_prithvi surgery deletes the decoder)."""
    pr = ref["prithvi"]
    ps = ref["prithvi_segmentation"]
    args = _tiny_args()
    torch.manual_seed(5)
    tiny_backbone = pr.MaskedAutoencoderViT(**args)
    monkeypatch.setattr(ps, "load_prithvi", lambda num_frames: tiny_backbone)
    tcfg = ps.PrithviSegmentationNetConfig(
        num_frames=1, num_classes=4, fcn_out_channels=32, fcn_num_convs=2,
        fcn_dropout=0.1, frozen_backbone=True, embed_dim=args["embed_dim"],
        patch_height=2, patch_width=2,
    )
    tnet = ps.PrithviSegmentationNet(tcfg)
    sd = tnet.state_dict()

    from s2tpu.checkpoint.convert_torch import export_reference_prithvi_seg_state_dict
    from s2tpu.models.prithvi_mae import PrithviConfig

    params, stats = convert_reference_prithvi_seg_state_dict(sd)
    back = export_reference_prithvi_seg_state_dict(
        params, stats, PrithviConfig.from_model_args(args)
    )

    # decoder-side backbone keys are the only ones absent (dropped by the
    # forward converter; the real reference backbone has no decoder at all)
    missing = set(sd.keys()) - set(back)
    assert all(
        k.startswith(("backbone.decoder_", "backbone.mask_token")) for k in missing
    ), missing
    assert set(back) - set(sd.keys()) == set()
    for k, v in back.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k == "backbone.pos_embed":
            np.testing.assert_allclose(v, sd[k].numpy(), atol=1e-6, err_msg=k)
        else:
            np.testing.assert_array_equal(v, sd[k].numpy(), err_msg=k)
    res = tnet.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in back.items()}, strict=False
    )
    assert res.unexpected_keys == []
    assert all(
        k.startswith(("backbone.decoder_", "backbone.mask_token")) for k in res.missing_keys
    )
