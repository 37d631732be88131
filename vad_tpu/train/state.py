"""Train state, optimizer, and plateau LR schedule.

Optimizer parity with the reference: Adam with torch-style weight decay
(grad + wd*param fed into Adam — reference train.py:159,
train_video.py:176) and a ReduceLROnPlateau schedule (factor 0.5,
patience 5; 'min' on val loss for images, 'max' on separation for video —
train.py:162-164, train_video.py:178-180).

The learning rate is injected as optimizer-state hyperparameter so the
host-side plateau controller can change it between epochs without
recompiling the jitted train step.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState + BatchNorm running statistics."""

    batch_stats: Any = struct.field(pytree_node=True, default=None)


def make_optimizer(learning_rate: float, weight_decay: float = 1e-5):
    """Adam with torch-semantics weight decay and injectable LR."""

    @optax.inject_hyperparams
    def opt(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(learning_rate),
        )

    return opt(learning_rate)


def create_train_state(model, variables, learning_rate: float, weight_decay: float = 1e-5):
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats") or {},
        tx=make_optimizer(learning_rate, weight_decay),
    )


def current_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


class ReduceLROnPlateau:
    """Host-side plateau controller (torch semantics: rel threshold 1e-4,
    cooldown 0, min_lr 0)."""

    def __init__(
        self,
        mode: str = "min",
        factor: float = 0.5,
        patience: int = 5,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ) -> None:
        assert mode in ("min", "max")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad = 0

    def _is_better(self, value: float) -> bool:
        if self.mode == "min":
            return value < self.best * (1.0 - self.threshold)
        return value > self.best * (1.0 + self.threshold)

    def step(self, value: float, lr: float) -> float:
        """Feed the epoch metric; returns the (possibly reduced) LR."""
        if self._is_better(value):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            self.num_bad = 0
        return lr
