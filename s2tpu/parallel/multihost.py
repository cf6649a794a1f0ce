"""Multi-host (DCN) data parallelism.

Single-slice training scales over ICI inside one process; multi-host pods
(or multi-slice DCN deployments) run one process per host, each seeing only
its local devices. This module supplies the three pieces the rest of the
framework needs (SURVEY.md §2: "pjit/shard_map over ICI, jax.distributed
over DCN for multi-host"; reference latent hook prithvi_mae_finetune.py:118):

  1. ``initialize()`` — jax.distributed bring-up (coordinator + process id,
     env-driven on TPU pods where JAX autodetects everything).
  2. Per-process input sharding: every process draws the SAME epoch order
     and crop/flip randomness (same seeds), then feeds only its slice of
     each global batch — no cross-host data exchange for inputs.
  3. ``make_global_batch`` — assembles a globally-sharded jax.Array from the
     process-local numpy shard (jax.make_array_from_process_local_data), so
     the jit'd train step runs unchanged: XLA inserts gradient psums over
     ICI within a slice and DCN across slices.

The 2-process CPU simulation test (tests/test_multihost.py) exercises this
end-to-end without TPU hardware.
"""

from __future__ import annotations

import typing

import jax
import numpy as np

from s2tpu.utils import get_logger

logger = get_logger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: typing.Sequence[int] | None = None,
) -> None:
    """Bring up jax.distributed. On TPU pods all arguments are autodetected
    from the environment; pass them explicitly for CPU simulation/tests.

    Must run before any other JAX call creates a backend. No-op when the
    runtime is already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            logger.warning("jax.distributed already initialized; skipping")
        else:
            raise
    logger.info(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{len(jax.local_devices())} local / {jax.device_count()} global devices"
    )


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_slice(global_batch_size: int, n_proc: int | None = None, index: int | None = None) -> slice:
    """This process's contiguous slice of a global batch."""
    n = n_proc if n_proc is not None else jax.process_count()
    i = index if index is not None else jax.process_index()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} must divide process count {n}"
    )
    per = global_batch_size // n
    return slice(i * per, (i + 1) * per)


def make_global_batch(
    local_array: np.ndarray, sharding: jax.sharding.NamedSharding
) -> jax.Array:
    """Process-local (B_local, ...) numpy shard -> global (B_global, ...)
    jax.Array laid out on ``sharding`` (batch axis over 'data')."""
    return jax.make_array_from_process_local_data(sharding, local_array)


def put_batch(array: np.ndarray, sharding: jax.sharding.NamedSharding) -> jax.Array:
    """device_put for single-process; global-array assembly under multihost."""
    if jax.process_count() > 1:
        return make_global_batch(array, sharding)
    return jax.device_put(array, sharding)
