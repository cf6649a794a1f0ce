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


def _sample_trial_optuna(optuna_trial, space: SearchSpace) -> dict:
    """Draw one parameter set through optuna's suggest API (TPE sampling)."""
    return {
        "lr": optuna_trial.suggest_float("lr", *space.lr_log_range, log=True),
        "weight_decay": optuna_trial.suggest_float(
            "weight_decay", *space.weight_decay_log_range, log=True
        ),
        "loss_type": optuna_trial.suggest_categorical("loss_type", list(space.loss_types)),
        "focal_loss_gamma": optuna_trial.suggest_categorical(
            "focal_loss_gamma", list(space.focal_gammas)
        ),
        "weighted_loss": optuna_trial.suggest_categorical(
            "weighted_loss", list(space.weighted_loss)
        ),
    }


def tune(
    base_config: Config,
    datamodule_factory: typing.Callable[[Config], typing.Any],
    n_trials: int = 10,
    epochs_per_trial: int = 3,
    seed: int = 0,
    space: SearchSpace | None = None,
    mesh=None,
    backend: str = "random",
) -> list[TrialResult]:
    """Run hyperparameter-search trials; returns results sorted best-first.

    backend="random" (default, dependency-free) or "optuna" (TPE sampling —
    the reference's declared-but-stubbed tuner, train_segmentation.py:284-289;
    falls back to random search with a warning when optuna is not installed).
    """
    from s2tpu.train.trainer import SegmentationTrainer

    space = space or SearchSpace()
    results: list[TrialResult] = []

    def run_trial(trial_idx: int, params: dict) -> TrialResult:
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
            f"trial {trial_idx}: {params} -> val_loss {result.val_loss:.4f} iou {result.val_iou:.4f}"
        )
        return result

    if backend == "optuna":
        try:
            import optuna
        except ImportError:
            logger.warning("optuna not installed — falling back to random search")
            backend = "random"
        else:
            study = optuna.create_study(
                direction="minimize", sampler=optuna.samplers.TPESampler(seed=seed)
            )

            def objective(trial) -> float:
                params = _sample_trial_optuna(trial, space)
                return run_trial(trial.number, params).val_loss

            study.optimize(objective, n_trials=n_trials)
            return sorted(results, key=lambda r: r.val_loss)

    rng = np.random.default_rng(seed)
    for trial in range(n_trials):
        run_trial(trial, sample_trial(space, rng))
    return sorted(results, key=lambda r: r.val_loss)
