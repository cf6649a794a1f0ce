"""Device mesh + sharding rules.

The reference's only multi-device hook is Lightning's unused ``devices`` int
(SURVEY.md §2 parallelism statement). Here parallelism is first-class and
TPU-native: a ('data', 'model') `jax.sharding.Mesh`, batches sharded over
'data', parameters either replicated (pure DP), sharded over 'model'
(FSDP-style, largest axis), or tensor-parallel for the ViT (attention heads
/ MLP hidden over 'model'). The jit'd train step consumes these shardings
and XLA inserts the psum/all-gather collectives over ICI — no explicit
communication code anywhere.
"""

from __future__ import annotations

import typing

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_devices: int = -1, model_parallel: int = 1, devices: typing.Sequence[jax.Device] | None = None
) -> Mesh:
    """('data', 'model') mesh over the first num_devices devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices == -1:
        num_devices = len(devs)
    devs = devs[:num_devices]
    assert num_devices % model_parallel == 0, (num_devices, model_parallel)
    grid = np.array(devs).reshape(num_devices // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading axis over 'data', everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _largest_divisible_axis(shape: tuple[int, ...], n: int) -> int | None:
    """Pick the largest axis divisible by n (FSDP shard axis), else None."""
    best, best_size = None, 0
    for i, s in enumerate(shape):
        if s % n == 0 and s > best_size:
            best, best_size = i, s
    return best


def fsdp_param_shardings(params: typing.Any, mesh: Mesh, min_size: int = 2**16):
    """FSDP-style parameter shardings: shard each large tensor's largest
    'model'-divisible axis over the 'model' axis; small tensors replicate.

    With model_parallel == 1 this degrades gracefully to full replication.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def spec_for(leaf) -> NamedSharding:
        if n_model == 1 or leaf.size < min_size:
            return NamedSharding(mesh, P())
        axis = _largest_divisible_axis(leaf.shape, n_model)
        if axis is None:
            return NamedSharding(mesh, P())
        spec = [None] * leaf.ndim
        spec[axis] = MODEL_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(spec_for, params)


def shard_pytree(tree: typing.Any, shardings: typing.Any):
    """device_put a pytree onto per-leaf shardings."""
    return jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s), tree, shardings)


def replicate_pytree(tree: typing.Any, mesh: Mesh):
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        # device_put of host-local data onto a cross-process sharding is not
        # allowed; assemble global replicated arrays from the (identical,
        # same-seed) per-process values instead.
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), tree
        )
    return jax.device_put(tree, sharding)
