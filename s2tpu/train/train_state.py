"""Train state pytree + the reference-semantics Adam-with-L2 optimizer."""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: typing.Any
    batch_stats: typing.Any  # {} for BN-free models
    opt_state: typing.Any


class MasterState(typing.NamedTuple):
    """Optimizer state for `with_f32_master`: the f32 master params plus the
    wrapped optimizer's own state (whose moments track the master)."""

    master: typing.Any
    inner: typing.Any


class NewParams(typing.NamedTuple):
    """Marker wrapper returned by ``with_f32_master``'s update() in place of
    an updates tree: holds the NEW bf16 params directly. Consumers must
    unwrap explicitly (``new_params = updates.tree``); feeding it to
    ``optax.apply_updates`` or any delta-composing wrapper fails loudly with
    a tree-structure mismatch instead of silently adding params to params
    (ADVICE r2)."""

    tree: typing.Any


class EmaState(typing.NamedTuple):
    """Optimizer state for `with_param_ema`: the f32 exponential moving
    average of the post-update params, plus the wrapped optimizer's state."""

    ema: typing.Any
    inner: typing.Any


def with_param_ema(
    inner: optax.GradientTransformation, decay: float
) -> optax.GradientTransformation:
    """Maintain an exponential moving average of the NEW params after every
    optimizer step, inside the optimizer state — so it checkpoints, shards
    (FSDP shape-matching), donates, and restores with the rest of the state
    for free. Evaluation/serving on the averaged weights is a standard
    production-segmentation trick the reference lacks (its closest hook is
    torch.optim.swa_utils, unused).

    EMA leaves stay f32 even under bf16 param storage: the per-step increment
    ``(1-decay)*(p-e)`` is far below bf16 resolution at decay >= 0.99 and
    would round to a frozen average.

    Composes with :func:`with_f32_master` — wrap OUTSIDE it: the inner
    update's :class:`NewParams` marker is recognized here and passed through
    unchanged, so the trainers' mixed-precision contract branch is unaffected.
    """

    def init(params):
        return EmaState(ema=cast_floats(params, jnp.float32), inner=inner.init(params))

    def update(grads, state, params=None):
        updates, inner_state = inner.update(grads, state.inner, params)
        new_params = (
            updates.tree if isinstance(updates, NewParams)
            else optax.apply_updates(params, updates)
        )
        # Under with_f32_master the working params are bf16-quantized copies
        # of the f32 master; averaging those injects ~2^-8 relative
        # quantization noise per sample. Accumulate from the master itself
        # for a quantization-free average (ADVICE r4).
        ema_src = (
            inner_state.master if isinstance(inner_state, MasterState) else new_params
        )
        ema = jax.tree_util.tree_map(
            lambda e, p: (
                decay * e + (1.0 - decay) * p.astype(e.dtype)
                if jnp.issubdtype(e.dtype, jnp.floating) else p
            ),
            state.ema, ema_src,
        )
        return updates, EmaState(ema=ema, inner=inner_state)

    return optax.GradientTransformation(init, update)


def cast_floats(tree: typing.Any, dtype) -> typing.Any:
    """Cast floating-point leaves of a pytree to `dtype` (others untouched)."""
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p, tree
    )


def with_f32_master(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Mixed-precision parameter storage: model params live in bf16 (half the
    HBM reads per fwd/bwd pass and no per-step f32->bf16 weight casts), while
    the optimizer walks an f32 master copy kept inside the optimizer state —
    small Adam deltas never get rounded away by bf16's 8-bit mantissa.

    CONTRACT CHANGE vs plain optax: ``update()`` returns the NEW bf16 params
    wrapped in :class:`NewParams` (``new_params = updates.tree``), NOT a
    delta — re-deriving a bf16 delta and re-adding it would round twice.
    The wrapper makes any accidental ``optax.apply_updates`` / optax.chain
    composition fail with a tree-structure mismatch instead of corrupting
    weights. The trainers branch on this explicitly.
    """

    def init(params):
        master = cast_floats(params, jnp.float32)
        return MasterState(master=master, inner=inner.init(master))

    def update(grads, state, params=None):
        g32 = cast_floats(grads, jnp.float32)
        updates, inner_state = inner.update(g32, state.inner, state.master)
        master = optax.apply_updates(state.master, updates)
        template = params if params is not None else master
        new_params = jax.tree_util.tree_map(lambda m, p: m.astype(p.dtype), master, template)
        return NewParams(new_params), MasterState(master=master, inner=inner_state)

    return optax.GradientTransformation(init, update)


def adam_l2(
    learning_rate: optax.ScalarOrSchedule,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 folded into the gradient BEFORE the
    Adam moments (coupled decay), unlike optax.adamw's decoupled decay.
    Parity: reference train_segmentation.py:110-114 uses torch Adam with a
    ``weight_decay`` argument, which is coupled L2.
    """
    steps = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    steps += [optax.scale_by_adam(b1=b1, b2=b2), optax.scale_by_learning_rate(learning_rate)]
    return optax.chain(*steps)


def make_optimizer(
    learning_rate: optax.ScalarOrSchedule,
    weight_decay: float,
    betas: tuple[float, float],
    frozen_mask: typing.Any | None = None,
) -> optax.GradientTransformation:
    """Adam(+L2) with optional parameter freezing.

    ``frozen_mask`` is a pytree of bools (True = frozen); frozen leaves get
    zero updates (reference prithvi_segmentation.py:152-154 frozen backbone).
    """
    opt = adam_l2(learning_rate, weight_decay, *betas)
    if frozen_mask is not None:
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda frozen: "freeze" if frozen else "train", frozen_mask),
        )
    return opt
