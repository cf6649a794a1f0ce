"""Convert reference PyTorch checkpoints into s2tpu Orbax checkpoints.

    python -m s2tpu.cli.convert_weights prithvi weights/Prithvi_100M.pt --out weights/prithvi_flax
    python -m s2tpu.cli.convert_weights efficientnet weights/efficientnet-b5.pth \
        --version b5 --out weights/effb5_flax
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


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["prithvi", "efficientnet"])
    p.add_argument("path", help=".pt/.pth file from the reference ecosystem")
    p.add_argument("--out", required=True)
    p.add_argument("--num-frames", type=int, default=1)
    p.add_argument("--version", default="b0", help="EfficientNet version (b0-b7)")
    args = p.parse_args(argv)
    if args.kind == "prithvi":
        convert_prithvi(args.path, args.out, args.num_frames)
    else:
        convert_efficientnet(args.path, args.out, args.version)


if __name__ == "__main__":
    main()
