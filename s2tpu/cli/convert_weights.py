"""Convert reference PyTorch checkpoints into s2tpu Orbax checkpoints.

Backbone weights (pretrained encoders, loadable via train-CLI flags):

    python -m s2tpu.cli.convert_weights prithvi weights/Prithvi_100M.pt --out weights/prithvi_flax
    python -m s2tpu.cli.convert_weights efficientnet weights/efficientnet-b5.pth \
        --version b5 --out weights/effb5_flax

Full trained reference checkpoints (Lightning ``.ckpt`` from
train_segmentation.py, ``net.``-prefixed state dict — reference
train_segmentation.py:247-255): ``import-ckpt`` produces a COMPLETE s2tpu
checkpoint directory (config.json + epoch-0 Orbax state) that
``python -m s2tpu.cli.infer`` serves directly and ``--resume-from``
finetunes from — the one-command migration path for existing trained runs:

    python -m s2tpu.cli.convert_weights import-ckpt runs/unet_b5.ckpt \
        --model efficientnet-unet-b5 --aoi at --labels osm-multiclass \
        --out ckpts/sentinel-segmentation/imported-b5
    python -m s2tpu.cli.convert_weights import-ckpt runs/fc_prithvi.ckpt \
        --model fc-prithvi-backbone --aoi at --labels osm-multiclass \
        --out ckpts/sentinel-segmentation/imported-prithvi

Reverse migration (train on TPU, serve in an existing torch stack):
``export-unet`` writes a reference ``EfficientnetUnet``-strict state dict;
``export-prithvi`` writes an s2tpu MAE pretraining run in the published
``Prithvi_100M.pt`` layout (sincos pos embeds regenerated). Runs trained
with ``--ema-decay`` export the EMA-averaged weights by default — the same
weights validation/best-epoch selection and ``cli/infer`` serving use
(``--no-ema`` exports the raw params instead):

    python -m s2tpu.cli.convert_weights export-unet ckpts/sentinel-segmentation/<run> \
        --out exported_unet.pt
    python -m s2tpu.cli.convert_weights export-prithvi ckpts/prithvi-mae/<run> \
        --out exported_prithvi.pt
    python -m s2tpu.cli.convert_weights export-prithvi-seg ckpts/sentinel-segmentation/<run> \
        --out exported_seg.pt
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from s2tpu.utils import get_logger, load_prithvi_model_args

logger = get_logger(__name__)


def convert_prithvi(path: str, out: str, num_frames: int) -> None:
    from s2tpu.checkpoint.convert_torch import load_prithvi_weights
    from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE

    cfg = PrithviConfig.from_model_args(load_prithvi_model_args(), num_frames=num_frames)
    model = PrithviMAE(cfg)
    sample = jnp.zeros((1, num_frames, cfg.img_size, cfg.img_size, cfg.in_chans))
    template = jax.jit(lambda: model.init(jax.random.key(0), sample, mask_ratio=0.0))()["params"]
    params = load_prithvi_weights(template, num_frames=num_frames, path=path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(out).resolve(), params)
    ckptr.wait_until_finished()
    logger.info(f"Converted Prithvi weights -> {out}")


def convert_efficientnet(path: str, out: str, version: str) -> None:
    from s2tpu.checkpoint.convert_torch import load_efficientnet_weights
    from s2tpu.models.efficientnet_unet import EfficientNetUNet, EfficientNetUNetConfig

    cfg = EfficientNetUNetConfig(version=version, in_channels=6, num_classes=2)
    model = EfficientNetUNet(cfg)
    sample = jnp.zeros((1, 64, 64, 6))
    variables = jax.jit(lambda: model.init(jax.random.key(0), sample, train=False))()
    params, stats = load_efficientnet_weights(variables["params"], variables["batch_stats"], path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(out).resolve(), {"params": params, "batch_stats": stats})
    ckptr.wait_until_finished()
    logger.info(f"Converted EfficientNet-{version} weights -> {out}")


def import_reference_checkpoint(
    path: str, model_name: str, aoi: str, labels: str, out: str, crop: int | None = None
) -> None:
    """Trained reference Lightning ``.ckpt`` -> complete s2tpu checkpoint dir.

    Converts the ``net.``-prefixed state dict (reference
    train_segmentation.py:247-255 checkpoint policy) of either model family
    into s2tpu params/batch_stats, builds the optimizer state exactly as
    ``SegmentationTrainer._init_state`` does (so ``--resume-from`` restores
    leaf-for-leaf into the trainer's structure), and writes an epoch-0 Orbax
    checkpoint plus the ``config.json`` that ``cli/infer.py`` serves from.
    """
    import dataclasses

    from s2tpu.checkpoint.convert_torch import (
        load_reference_prithvi_seg_weights,
        load_reference_unet_weights,
    )
    from s2tpu.checkpoint.orbax_io import CheckpointManager
    from s2tpu.configs import segmentation as cfg_lib
    from s2tpu.train.schedules import build_schedule
    from s2tpu.train.train_state import TrainState, make_optimizer

    config = cfg_lib.base_config(model_name, aoi=aoi, label_map=labels)
    if crop:
        config.datamodule.random_crop_size = crop
    model = config.build_model()
    is_prithvi = config.model_name.value.startswith("fc-prithvi")
    size = config.datamodule.random_crop_size
    compute_dtype = jnp.bfloat16 if config.train.compute_dtype == "bfloat16" else jnp.float32
    sample = jnp.zeros((1, size, size, 6), compute_dtype)
    if not config.datamodule.dataset_cfg.squeeze_time_dim:
        sample = sample[:, None]  # (B, T=1, H, W, C) for the ViT

    variables = jax.jit(
        lambda: model.init(jax.random.key(config.train.seed), sample, train=False)
    )()
    template_p, template_s = variables["params"], variables.get("batch_stats", {})
    loader = load_reference_prithvi_seg_weights if is_prithvi else load_reference_unet_weights
    params, batch_stats = loader(template_p, template_s, path)

    frozen_mask = None
    if is_prithvi and model.config.frozen_backbone:
        frozen_mask = jax.tree_util.tree_map_with_path(
            lambda p, _: any(getattr(e, "key", None) == "backbone" for e in p), params
        )
    t = config.train
    schedule = build_schedule(t.lr, t.lr_scheduler_type.value if t.lr_scheduler_type else None)
    tx = make_optimizer(schedule, t.weight_decay, t.betas, frozen_mask)
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats, opt_state=opt_state
    )
    mgr = CheckpointManager(out, config_dict=dataclasses.asdict(config))
    mgr.save_epoch(0, state)
    mgr.wait()
    mgr.close()
    logger.info(f"Imported reference checkpoint {path} -> {out} (epoch 0)")


def _maybe_ema_params(raw: dict, cfg_dict: dict, use_ema: bool):
    """The param tree a torch export should carry: the EMA average when the
    run was trained with ``--ema-decay`` (validation/best-epoch selection and
    `cli/infer` serving use the averaged weights — exporting the raw params
    would silently ship weights that never produced the reported metrics),
    the live params otherwise. ``use_ema=False`` (`--no-ema`) opts out.

    The checkpoint stores ``opt_state`` as a flat leaf list
    (orbax_io._to_saveable); ``with_param_ema`` wraps OUTERMOST
    (trainer._init_state), and its f32 EMA tree has exactly the params'
    structure (train_state.EmaState), so the first ``len(leaves(params))``
    opt-state leaves ARE the EMA tree — recovered here without rebuilding
    the optimizer.
    """
    params = raw["params"]
    if not use_ema or not (cfg_dict.get("train") or {}).get("ema_decay"):
        return params, False
    leaves = raw["opt_state"]
    if isinstance(leaves, dict):  # orbax may key a restored list by index
        leaves = [leaves[k] for k in sorted(leaves, key=int)]
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    assert len(leaves) > len(flat_p), (
        "opt_state too small to contain an EMA tree — checkpoint predates "
        "--ema-decay support?"
    )
    ema = jax.tree_util.tree_unflatten(treedef, list(leaves)[: len(flat_p)])
    # Structural sanity: every EMA leaf must match its param's shape.
    jax.tree_util.tree_map(
        lambda e, p: None if jnp.shape(e) == jnp.shape(p) else (_ for _ in ()).throw(
            AssertionError(f"EMA leaf shape {jnp.shape(e)} != param {jnp.shape(p)}")
        ),
        ema, params,
    )
    return ema, True


def export_unet_checkpoint(
    ckpt_dir: str, out: str, epoch: int | None = None, use_ema: bool = True
) -> None:
    """Trained s2tpu UNet checkpoint dir -> reference ``EfficientnetUnet``
    state dict (.pt, strict-loadable) — the reverse migration path: train on
    TPU, serve in an existing torch stack."""
    import torch

    from s2tpu.checkpoint.convert_torch import export_reference_unet_state_dict
    from s2tpu.checkpoint.orbax_io import CheckpointManager

    mgr = CheckpointManager(ckpt_dir)
    cfg = mgr.load_config()
    assert cfg is not None, f"no config.json in {ckpt_dir}"
    assert str(cfg["model_name"]).startswith("efficientnet-unet"), (
        f"export-unet needs an efficientnet-unet checkpoint, got {cfg['model_name']}"
    )
    raw = mgr.restore_raw(epoch)
    mgr.close()
    params, is_ema = _maybe_ema_params(raw, cfg, use_ema)
    sd = export_reference_unet_state_dict(params, raw["batch_stats"])
    torch.save({k: torch.from_numpy(np_v) for k, np_v in sd.items()}, out)
    logger.info(
        f"Exported {ckpt_dir} -> {out} ({len(sd)} tensors, reference UNet layout"
        f"{', EMA weights' if is_ema else ''})"
    )


def export_prithvi_checkpoint(
    ckpt_dir: str, out: str, epoch: int | None = None, use_ema: bool = True
) -> None:
    """s2tpu MAE pretraining checkpoint dir -> ``Prithvi_100M.pt``-layout
    state dict, so a TPU pretrain feeds the reference's load_prithvi surgery
    (reference utils.py:62-96) or any torch HLS stack."""
    import torch

    from s2tpu.checkpoint.convert_torch import export_prithvi_state_dict
    from s2tpu.checkpoint.orbax_io import CheckpointManager
    from s2tpu.configs import mae as mae_cfg
    from s2tpu.models.prithvi_mae import PrithviConfig

    mgr = CheckpointManager(ckpt_dir)
    cfg_dict = mgr.load_config()
    assert cfg_dict is not None, f"no config.json in {ckpt_dir}"
    config = mae_cfg.config_from_dict(cfg_dict)
    model_config = PrithviConfig.from_model_args(
        load_prithvi_model_args(),
        num_frames=config.model.num_frames,
        img_size=config.datamodule.random_crop_size,
    )
    raw = mgr.restore_raw(epoch)
    mgr.close()
    params, is_ema = _maybe_ema_params(raw, cfg_dict, use_ema)
    sd = export_prithvi_state_dict(params, model_config)
    torch.save({k: torch.from_numpy(np_v) for k, np_v in sd.items()}, out)
    logger.info(
        f"Exported {ckpt_dir} -> {out} ({len(sd)} tensors, Prithvi_100M layout"
        f"{', EMA weights' if is_ema else ''})"
    )


def export_prithvi_seg_checkpoint(
    ckpt_dir: str, out: str, epoch: int | None = None, use_ema: bool = True
) -> None:
    """Trained s2tpu fc-prithvi segmentation checkpoint dir -> reference
    ``PrithviSegmentationNet.state_dict()`` naming (.pt) — backbone pos
    embeds regenerated from the same sincos tables the reference surgery
    uses."""
    import torch

    from s2tpu.checkpoint.convert_torch import export_reference_prithvi_seg_state_dict
    from s2tpu.checkpoint.orbax_io import CheckpointManager
    from s2tpu.cli.infer import _config_from_dict

    mgr = CheckpointManager(ckpt_dir)
    cfg_dict = mgr.load_config()
    assert cfg_dict is not None, f"no config.json in {ckpt_dir}"
    config = _config_from_dict(cfg_dict)
    assert config.model_name.value.startswith("fc-prithvi"), (
        f"export-prithvi-seg needs an fc-prithvi checkpoint, got {config.model_name.value}"
    )
    backbone_cfg = config.build_model().config.backbone
    raw = mgr.restore_raw(epoch)
    mgr.close()
    params, is_ema = _maybe_ema_params(raw, cfg_dict, use_ema)
    sd = export_reference_prithvi_seg_state_dict(params, raw["batch_stats"], backbone_cfg)
    torch.save({k: torch.from_numpy(np_v) for k, np_v in sd.items()}, out)
    logger.info(
        f"Exported {ckpt_dir} -> {out} ({len(sd)} tensors, reference seg-net layout"
        f"{', EMA weights' if is_ema else ''})"
    )


def main(argv: list[str] | None = None) -> None:
    from s2tpu.configs.data_config import AOIs, LABEL_MAPS

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "kind",
        choices=[
            "prithvi", "efficientnet", "import-ckpt",
            "export-unet", "export-prithvi", "export-prithvi-seg",
        ],
    )
    p.add_argument(
        "path",
        help=".pt/.pth/.ckpt file from the reference ecosystem (import), or an "
        "s2tpu checkpoint directory (export-*)",
    )
    p.add_argument("--out", required=True)
    p.add_argument("--num-frames", type=int, default=1)
    p.add_argument("--version", default="b0", help="EfficientNet version (b0-b7)")
    # import-ckpt: the run identity the checkpoint was trained under
    p.add_argument("--model", default=None, help="import-ckpt: reference model name")
    p.add_argument("--aoi", default=None, choices=list(AOIs), help="import-ckpt: AOI")
    p.add_argument("--labels", default=None, choices=list(LABEL_MAPS), help="import-ckpt: label map")
    p.add_argument("--crop", type=int, default=None, help="import-ckpt: crop/tile size (default 224)")
    p.add_argument("--epoch", type=int, default=None, help="export-*: checkpoint epoch (default latest)")
    p.add_argument(
        "--no-ema", action="store_true",
        help="export-*: export the raw (non-averaged) params even when the run "
        "was trained with --ema-decay (default exports the EMA — the weights "
        "validation/serving actually used, matching cli/infer)",
    )
    args = p.parse_args(argv)
    if args.kind == "prithvi":
        convert_prithvi(args.path, args.out, args.num_frames)
    elif args.kind == "efficientnet":
        convert_efficientnet(args.path, args.out, args.version)
    elif args.kind == "export-unet":
        export_unet_checkpoint(args.path, args.out, epoch=args.epoch, use_ema=not args.no_ema)
    elif args.kind == "export-prithvi":
        export_prithvi_checkpoint(args.path, args.out, epoch=args.epoch, use_ema=not args.no_ema)
    elif args.kind == "export-prithvi-seg":
        export_prithvi_seg_checkpoint(
            args.path, args.out, epoch=args.epoch, use_ema=not args.no_ema
        )
    else:
        if not (args.model and args.aoi and args.labels):
            p.error("import-ckpt requires --model, --aoi and --labels")
        import_reference_checkpoint(
            args.path, args.model, args.aoi, args.labels, args.out, crop=args.crop
        )


if __name__ == "__main__":
    main()
