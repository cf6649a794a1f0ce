"""Multi-host (DCN) data parallelism: 2-process CPU simulation.

Spawns two real processes, each with 4 virtual CPU devices, joined through
jax.distributed (coordinator on localhost). Each process feeds its slice of
the global batch; gradients psum across the process boundary exactly as they
would over DCN on a multi-slice pod. Both processes must report identical
losses (state is fully replicated).
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path_factory):
    # Dedicated fixture: the global batch (8 = one per device) needs more
    # train segments than the shared 6-segment fixture provides.
    from s2tpu.data.dataset import make_synthetic_fixture

    fixture_dir = tmp_path_factory.mktemp("mh_data")
    make_synthetic_fixture(
        fixture_dir, aoi="small", label_map="osm-multiclass", n_segments=20, size=(96, 96)
    )
    port = _free_port()
    env_base = {"PYTHONPATH": str(REPO)}
    import os

    env = {**os.environ, **env_base}
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"), str(port), str(i), str(fixture_dir)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-2000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))
    r0, r1 = sorted(results, key=lambda r: r["pid"])
    assert r0["pid"] == 0 and r1["pid"] == 1
    # fully-replicated state + global-batch loss => identical metrics
    assert np.isfinite(r0["train_loss"])
    np.testing.assert_allclose(r0["train_loss"], r1["train_loss"], rtol=1e-6)
    np.testing.assert_allclose(r0["val_loss"], r1["val_loss"], rtol=1e-6)
    np.testing.assert_allclose(r0["val_iou"], r1["val_iou"], rtol=1e-6)
