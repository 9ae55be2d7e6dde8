"""Training utilities: loss functions, optimizer wiring, sharded train step.

The reference ships no training loop (SURVEY.md §0); this provides the
TPU-native one: pure functional train step over state-dict-shaped param
pytrees, jit/pjit-able over a Mesh with data-parallel batches and
tensor-parallel param shardings (see parallel/mesh.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def charbonnier_loss(pred, target, eps: float = 1e-6):
    return jnp.mean(jnp.sqrt(jnp.square(pred - target) + eps * eps))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


LOSSES: dict[str, Callable] = {'charbonnier': charbonnier_loss, 'l1': l1_loss, 'l2': l2_loss}


def make_optimizer(lr: float = 2e-4, weight_decay: float = 0.0, clip: float = 1.0) -> optax.GradientTransformation:
    steps = [optax.clip_by_global_norm(clip)]
    if weight_decay:
        steps.append(optax.adamw(lr, weight_decay=weight_decay))
    else:
        steps.append(optax.adam(lr))
    return optax.chain(*steps)


def split_trainable(params):
    """Split a state-dict pytree into (float trainables, static int buffers)."""
    trainable = {k: v for k, v in params.items() if jnp.issubdtype(v.dtype, jnp.floating)}
    static = {k: v for k, v in params.items() if k not in trainable}
    return trainable, static


def init_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    params = {k: v.astype(jnp.float32) if jnp.issubdtype(v.dtype, jnp.floating) else v for k, v in params.items()}
    trainable, _ = split_trainable(params)
    return TrainState(params=params, opt_state=optimizer.init(trainable), step=jnp.zeros((), jnp.int32))


def make_train_step(
    apply_fn: Callable,
    config: Any,
    optimizer: optax.GradientTransformation,
    loss: str | Callable = 'charbonnier',
):
    """Build a pure ``(state, lr, hr) -> (state, metrics)`` step function.

    ``apply_fn(config, params, x)`` is any SRModel apply; ``lr``/``hr`` are
    NHWC batches.  jit/pjit the result with whatever shardings the caller
    laid out — all collectives are inserted by XLA from those shardings."""
    loss_fn = LOSSES[loss] if isinstance(loss, str) else loss
    model = functools.partial(apply_fn, config)

    def train_step(state: TrainState, lr_batch, hr_batch):
        trainable, static = split_trainable(state.params)

        def compute_loss(tp):
            pred = model({**tp, **static}, lr_batch)
            return loss_fn(pred, hr_batch)

        loss_val, grads = jax.value_and_grad(compute_loss)(trainable)
        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        gnorm = optax.global_norm(grads)
        params = {**trainable, **static}
        return TrainState(params, opt_state, state.step + 1), {'loss': loss_val, 'grad_norm': gnorm}

    return train_step


def psnr(pred, target, max_val: float = 1.0):
    mse = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))
