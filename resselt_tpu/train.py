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
    ema: Any = None  # EMA of the float params, or None when disabled


def charbonnier_loss(pred, target, eps: float = 1e-6):
    return jnp.mean(jnp.sqrt(jnp.square(pred - target) + eps * eps))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


LOSSES: dict[str, Callable] = {'charbonnier': charbonnier_loss, 'l1': l1_loss, 'l2': l2_loss}


def make_lr_schedule(
    base_lr: float = 2e-4,
    kind: str = 'constant',
    total_steps: int = 0,
    warmup_steps: int = 0,
    milestones: tuple[int, ...] = (),
    gamma: float = 0.5,
):
    """Standard SR learning-rate schedules (constant / cosine / multistep),
    each with optional linear warmup."""
    if kind == 'constant':
        sched = optax.constant_schedule(base_lr)
    elif kind == 'cosine':
        if total_steps <= warmup_steps:
            raise ValueError('cosine schedule needs total_steps > warmup_steps')
        sched = optax.cosine_decay_schedule(base_lr, total_steps - warmup_steps)
    elif kind == 'multistep':
        # milestones are GLOBAL steps; join_schedules passes the inner
        # schedule (step - warmup_steps), so shift the boundaries to match
        sched = optax.piecewise_constant_schedule(
            base_lr, {int(m) - warmup_steps: gamma for m in milestones}
        )
    else:
        raise ValueError(f'unknown schedule {kind!r}')
    if warmup_steps:
        warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
        sched = optax.join_schedules([warm, sched], [warmup_steps])
    return sched


def make_optimizer(
    lr: 'float | Callable' = 2e-4,
    weight_decay: float = 0.0,
    clip: float = 1.0,
) -> optax.GradientTransformation:
    """Adam(W) with global-norm clipping; ``lr`` may be a schedule."""
    steps = [optax.clip_by_global_norm(clip)]
    if weight_decay:
        steps.append(optax.adamw(lr, weight_decay=weight_decay))
    else:
        steps.append(optax.adam(lr))
    return optax.chain(*steps)


_NON_TRAINABLE_SUFFIXES = ('running_mean', 'running_var', 'num_batches_tracked')


def split_trainable(params):
    """Split a state-dict pytree into (float trainables, static buffers).

    BatchNorm running statistics are float but NOT trainable (torch
    registers them as buffers): with adamw their gradients are zero yet
    decoupled weight decay would still shrink them every step, corrupting
    eval-mode normalization."""
    trainable = {
        k: v for k, v in params.items()
        if jnp.issubdtype(v.dtype, jnp.floating) and not k.endswith(_NON_TRAINABLE_SUFFIXES)
    }
    static = {k: v for k, v in params.items() if k not in trainable}
    return trainable, static


def init_train_state(params, optimizer: optax.GradientTransformation, ema: bool = False) -> TrainState:
    params = {k: v.astype(jnp.float32) if jnp.issubdtype(v.dtype, jnp.floating) else v for k, v in params.items()}
    trainable, _ = split_trainable(params)
    return TrainState(
        params=params,
        opt_state=optimizer.init(trainable),
        step=jnp.zeros((), jnp.int32),
        # real copies, not aliases: state donation must not see one buffer twice
        ema=jax.tree.map(lambda v: jnp.array(v, copy=True), trainable) if ema else None,
    )


def make_train_step(
    apply_fn: Callable,
    config: Any,
    optimizer: optax.GradientTransformation,
    loss: str | Callable = 'charbonnier',
    ema_decay: float = 0.0,
    remat: bool = False,
):
    """Build a pure ``(state, lr, hr) -> (state, metrics)`` step function.

    ``apply_fn(config, params, x)`` is any SRModel apply; ``lr``/``hr`` are
    NHWC batches.  jit/pjit the result with whatever shardings the caller
    laid out — all collectives are inserted by XLA from those shardings.
    The step is safe to jit with ``donate_argnums=(0,)`` (the state is
    consumed and rebuilt), which lets XLA reuse the param/opt buffers
    in-place instead of doubling HBM.

    ``ema_decay`` > 0 maintains an exponential moving average of the float
    params in ``state.ema`` (the TPU-native analogue of the reference
    checkpoints' ``params_ema`` entries, which the loader unwraps —
    resselt/utilities/state_dict.py:16-36)."""
    loss_fn = LOSSES[loss] if isinstance(loss, str) else loss
    model = functools.partial(apply_fn, config)
    if remat:
        # trade FLOPs for HBM: recompute activations in the backward pass
        # instead of stashing them — lets bigger crops/batches fit one chip
        model = jax.checkpoint(model)

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
        ema = state.ema
        if ema_decay and ema is not None:
            ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, trainable
            )
        return (
            TrainState(params, opt_state, state.step + 1, ema),
            {'loss': loss_val, 'grad_norm': gnorm},
        )

    return train_step


def ema_params(state: TrainState):
    """Full param dict with EMA weights swapped in for the float params."""
    if state.ema is None:
        return state.params
    _, static = split_trainable(state.params)
    return {**state.ema, **static}


def psnr(pred, target, max_val: float = 1.0):
    mse = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))


def save_train_state(state: TrainState, path: str) -> None:
    """Checkpoint the FULL training state (params, optimizer, step, EMA)
    with orbax, for exact resume.  The reference only reads checkpoints
    (SURVEY.md §5 checkpoint/resume row); this is the write+resume side."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state._asdict(), force=True)
    ckptr.wait_until_finished()


def load_train_state(path: str, template: TrainState) -> TrainState:
    """Restore a training state saved by ``save_train_state``.

    ``template`` (e.g. a freshly built state from the same model+optimizer)
    supplies the tree structure, shapes, dtypes, and shardings."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        jax.tree.map(ocp.utils.to_shape_dtype_struct, template._asdict()),
    )
    return TrainState(**restored)
