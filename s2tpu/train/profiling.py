"""Profiling / tracing: jax.profiler capture + step timing.

The reference has no profiling at all (SURVEY.md §5: "Tracing/profiling:
none"); this is the cheap first-class improvement called out there. Traces
open in TensorBoard/XProf/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
import typing
from pathlib import Path

import jax

from s2tpu.configs.paths import LOG_DIR


@contextlib.contextmanager
def trace(name: str = "trace", log_dir: str | Path | None = None):
    """Capture a jax.profiler trace around a block of steps."""
    out = Path(log_dir) if log_dir is not None else LOG_DIR / "profiles" / name
    out.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(out))
    try:
        yield out
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Block-until-ready step timing with warmup discard and percentiles."""

    def __init__(self, warmup: int = 2) -> None:
        self.warmup = warmup
        self.times: list[float] = []
        self._count = 0

    @contextlib.contextmanager
    def step(self, sync: typing.Any = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self._count += 1
        if self._count > self.warmup:
            self.times.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[int(n * 0.9)],
            "min_s": ts[0],
        }


def profile_step_fn(
    step_fn: typing.Callable,
    args_fn: typing.Callable[[], tuple],
    steps: int = 20,
    warmup: int = 3,
    trace_name: str | None = None,
) -> dict:
    """Time a jit'd step function; optionally capture a trace of 3 steps."""
    timer = StepTimer(warmup=warmup)
    out = None
    for _ in range(steps):
        with timer.step(sync=out):
            out = step_fn(*args_fn())
    summary = timer.summary()
    if trace_name is not None:
        with trace(trace_name):
            for _ in range(3):
                out = step_fn(*args_fn())
            jax.block_until_ready(out)
    return summary


TPU_V5E_PEAK_BF16 = 197e12  # bf16 peak FLOP/s of one v5e chip


def mfu_from_lowered(
    lower: typing.Callable[[], typing.Any],
    n_steps: int,
    elapsed_s: float,
    peak_flops: float = TPU_V5E_PEAK_BF16,
) -> float | None:
    """MFU from XLA's own cost model on a lowered step program.

    ``lower`` is a thunk returning ``jitted.lower(*args)``; the compiled
    program's ``cost_analysis()`` flops are taken as one optimizer step's.
    XLA counts a lax.scan body ONCE (not x trip count), so a K-fused
    steps-per-dispatch program reports one step's flops already (verified in
    bench.py: corpus-mode MFU matched the streamed single-step MFU exactly at
    div=1 and was 10x low at div=K). Shared by bench.py and
    scripts/bench_multitemporal.py so MFU accounting can never diverge
    between the published columns. Returns None when cost analysis is
    unavailable (MFU is informational only).
    """
    try:
        cost = lower().compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_per_step = float(cost.get("flops", 0.0))
        if flops_per_step > 0:
            return flops_per_step * (n_steps / elapsed_s) / peak_flops
    except Exception:  # noqa: BLE001
        pass
    return None
