"""Hyperparameter tuning: random search over short training runs.

The reference declares a ``tune`` run type with empty optuna stubs
(train_segmentation.py:284-289). This is the working equivalent: a
self-contained random-search loop (no optuna dependency) over a declarative
search space, scoring each trial by best validation loss over a short fit.
"""

from __future__ import annotations

import copy
import dataclasses
import math
import typing

import numpy as np

from s2tpu.configs.segmentation import Config, LossType
from s2tpu.utils import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass
class SearchSpace:
    lr_log_range: tuple[float, float] = (1e-5, 1e-2)
    weight_decay_log_range: tuple[float, float] = (1e-4, 1e-1)
    loss_types: tuple[str, ...] = ("ce", "focal", "dice_focal")
    focal_gammas: tuple[float, ...] = (1.0, 2.0, 3.0)
    weighted_loss: tuple[bool, ...] = (False, True)


@dataclasses.dataclass
class TrialResult:
    params: dict
    val_loss: float
    val_iou: float
    history: list[dict]


def sample_trial(space: SearchSpace, rng: np.random.Generator) -> dict:
    log_u = lambda lo, hi: float(math.exp(rng.uniform(math.log(lo), math.log(hi))))  # noqa: E731
    return {
        "lr": log_u(*space.lr_log_range),
        "weight_decay": log_u(*space.weight_decay_log_range),
        "loss_type": str(rng.choice(space.loss_types)),
        "focal_loss_gamma": float(rng.choice(space.focal_gammas)),
        "weighted_loss": bool(rng.choice(space.weighted_loss)),
    }


def apply_trial(config: Config, params: dict) -> Config:
    config = copy.deepcopy(config)
    config.train.lr = params["lr"]
    config.train.weight_decay = params["weight_decay"]
    config.train.loss_type = LossType(params["loss_type"])
    config.train.focal_loss_gamma = params["focal_loss_gamma"]
    config.train.weighted_loss = params["weighted_loss"]
    return config


def tune(
    base_config: Config,
    datamodule_factory: typing.Callable[[Config], typing.Any],
    n_trials: int = 10,
    epochs_per_trial: int = 3,
    seed: int = 0,
    space: SearchSpace | None = None,
    mesh=None,
) -> list[TrialResult]:
    """Run random-search trials; returns results sorted best-first."""
    from s2tpu.train.trainer import SegmentationTrainer

    space = space or SearchSpace()
    rng = np.random.default_rng(seed)
    results: list[TrialResult] = []
    for trial in range(n_trials):
        params = sample_trial(space, rng)
        cfg = apply_trial(base_config, params)
        dm = datamodule_factory(cfg)
        trainer = SegmentationTrainer(cfg, dm, mesh=mesh)
        history = trainer.fit(epochs=epochs_per_trial)
        val_losses = [h.get("val/loss", float("inf")) for h in history]
        val_ious = [h.get("val/iou", 0.0) for h in history]
        best = int(np.argmin(val_losses))
        result = TrialResult(params, float(val_losses[best]), float(val_ious[best]), history)
        results.append(result)
        logger.info(
            f"trial {trial}: {params} -> val_loss {result.val_loss:.4f} iou {result.val_iou:.4f}"
        )
    return sorted(results, key=lambda r: r.val_loss)
