"""Train state pytree + the reference-semantics Adam-with-L2 optimizer."""

from __future__ import annotations

import typing

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: typing.Any
    batch_stats: typing.Any  # {} for BN-free models
    opt_state: typing.Any


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
