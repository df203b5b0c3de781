"""Optimizer construction and train state.

Reference semantics (models.py:161-179): `adam` uses the CONSTANT
`starter_learning_rate` (the exponential-decay schedule is built but
ignored, models.py:168 — reproduced deliberately); `sgd` / `momentum` (0.9)
use staircase exponential decay.  L2 regularization adds
`l2 * sum(0.5*||w||^2)` to the loss (models.py:152-158) — applied here as
its exact gradient via `optax.add_decayed_weights`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Any  # int32 scalar


def learning_rate_schedule(config: dict):
    if config["optimizer_type"] == "adam":
        return optax.constant_schedule(float(config["starter_learning_rate"]))
    return optax.exponential_decay(
        init_value=float(config["starter_learning_rate"]),
        transition_steps=int(config["lr_updating_steps"]),
        decay_rate=float(config["lr_decay"]),
        staircase=True,
    )


def make_optimizer(config: dict, trainable_mask=None) -> optax.GradientTransformation:
    schedule = learning_rate_schedule(config)
    opt_type = config["optimizer_type"]
    if opt_type == "adam":
        opt = optax.adam(schedule)
    elif opt_type == "sgd":
        opt = optax.sgd(schedule)
    elif opt_type == "momentum":
        opt = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError("Optimizer must be either sgd, momentum or adam")
    chain = []
    l2 = float(config.get("l2", 0.0))
    if l2:
        chain.append(optax.add_decayed_weights(l2))
    chain.append(opt)
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
    return tx


def create_train_state(params, config: dict, trainable_mask=None) -> tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(config, trainable_mask)
    import jax.numpy as jnp

    return TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0)), tx
