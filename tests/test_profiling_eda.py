"""Profiling utilities + EDA stats tests."""

import jax.numpy as jnp
import numpy as np

from s2tpu.train.profiling import StepTimer, profile_step_fn


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_s"] >= 0 and s["p50_s"] >= 0


def test_profile_step_fn():
    import jax

    f = jax.jit(lambda x: x * 2 + 1)
    summary = profile_step_fn(f, lambda: (jnp.ones((8, 8)),), steps=5, warmup=1)
    assert summary["steps"] == 4
    assert summary["min_s"] > 0


def test_eda_stats(fixture_dir):
    from s2tpu.cli.eda import label_stats, sentinel_stats
    from s2tpu.data.dataset import TiffSource

    src = TiffSource("small", "osm-multiclass", data_dir=fixture_dir)
    ls = label_stats(src, 4)
    np.testing.assert_allclose(sum(ls["class_distribution"]), 1.0, rtol=1e-6)
    assert sum(ls["unlabeled_fraction_hist"]) == len(src)
    ss = sentinel_stats(src)
    assert ss["segments"] == len(src)
    assert 0 <= ss["zero_fraction_mean"] <= 1


def test_eda_cli(fixture_dir, tmp_path, capsys):
    from s2tpu.cli.eda import main

    main(["small", "osm-multiclass", "--data-dir", str(fixture_dir), "--out", str(tmp_path)])
    assert (tmp_path / "eda.json").exists()
    assert (tmp_path / "class_distribution.png").exists()


def test_eda_segment_grid_cli(tmp_path, capsys):
    from s2tpu.cli.eda import main

    main(["small", "osm-multiclass", "--segment-grid", "--out", str(tmp_path)])
    out = capsys.readouterr().out
    import json

    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["segments"] >= 1
    assert (tmp_path / "segment_grid_small.png").exists()
