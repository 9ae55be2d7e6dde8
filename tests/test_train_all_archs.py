"""Training sweep: one optimizer step through every architecture family.

Proves the whole zoo is differentiable end-to-end under jit — gradients
flow through window attention, ATD's sort/gather grouping, FFT attention
(LAWFFT/GFISR/FIGSR), deformable grid sampling (DySample/LDA_AQU), and
every pad/crop geometry — and that the functional train step handles each
family's mixed float/int param dicts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import resselt_tpu
from resselt_tpu.train import init_train_state, make_optimizer, make_train_step
from tests.test_detection_matrix import _tiny_models
from tests.test_tiled_all_archs import _BIG_WINDOW, _fix_figsr
from tests.torch_ref import init_random, state_dict_to_numpy


@pytest.mark.parametrize('name', sorted(_tiny_models().keys()))
def test_one_train_step(name):
    expect = name.split('-')[0]
    ref = init_random(_tiny_models()[name], seed=hash(name) % 2**31).eval()
    if expect == 'FIGSR':
        _fix_figsr(ref)
    model = resselt_tpu.load_from_state_dict(state_dict_to_numpy(ref.state_dict()))

    hw = (48, 56) if expect in _BIG_WINDOW else (24, 32)
    lr = jnp.asarray(np.random.default_rng(0).random((1, *hw, 3), dtype=np.float32))
    y = model.apply(model.params, lr)  # discover the true output shape
    hr = jnp.asarray(np.random.default_rng(1).random(y.shape, dtype=np.float32))

    opt = make_optimizer(lr=1e-4)
    state = init_train_state(model.params, opt)
    step = jax.jit(make_train_step(model._apply_fn, model.config, opt))
    state, metrics = step(state, lr, hr)

    assert np.isfinite(float(metrics['loss'])), name
    gn = float(metrics['grad_norm'])
    assert np.isfinite(gn) and gn > 0, f'{name}: grad_norm={gn}'
    assert int(state.step) == 1
