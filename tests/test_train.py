"""Training utilities: schedules, EMA, buffer donation (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import resselt_tpu
from resselt_tpu.train import (
    ema_params,
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
from resselt_tpu.zoo import make_compact


def _model():
    return resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2))


def test_lr_schedules():
    s = make_lr_schedule(1e-3, 'constant')
    assert float(s(0)) == pytest.approx(1e-3)

    s = make_lr_schedule(1e-3, 'cosine', total_steps=100)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-9)

    s = make_lr_schedule(1e-3, 'multistep', milestones=(10, 20), gamma=0.5)
    assert float(s(5)) == pytest.approx(1e-3)
    assert float(s(15)) == pytest.approx(5e-4)
    assert float(s(25)) == pytest.approx(2.5e-4)

    s = make_lr_schedule(1e-3, 'cosine', total_steps=100, warmup_steps=10)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1e-3)

    # multistep milestones are GLOBAL steps even with warmup: the drop at
    # milestone 20 must not slide to 20+warmup (regression)
    s = make_lr_schedule(1e-3, 'multistep', milestones=(20,), gamma=0.5, warmup_steps=10)
    assert float(s(15)) == pytest.approx(1e-3)
    assert float(s(25)) == pytest.approx(5e-4)
    assert float(s(5)) == pytest.approx(5e-4)  # linear warmup half-way

    with pytest.raises(ValueError):
        make_lr_schedule(1e-3, 'nope')
    with pytest.raises(ValueError):
        make_lr_schedule(1e-3, 'cosine', total_steps=0)


def test_split_trainable_excludes_bn_buffers():
    """BatchNorm running stats are float but not trainable — adamw's
    decoupled weight decay must never shrink them (regression)."""
    import jax.numpy as jnp

    from resselt_tpu.train import split_trainable

    params = {
        'conv.weight': jnp.ones((4, 3, 3, 3)),
        'bn.running_mean': jnp.ones((4,)),
        'bn.running_var': jnp.ones((4,)),
        'bn.num_batches_tracked': jnp.ones((), jnp.int32),
        'bn.weight': jnp.ones((4,)),
    }
    trainable, static = split_trainable(params)
    assert set(trainable) == {'conv.weight', 'bn.weight'}
    assert set(static) == {'bn.running_mean', 'bn.running_var', 'bn.num_batches_tracked'}


def test_ema_tracks_params():
    model = _model()
    opt = make_optimizer(lr=1e-2)
    state = init_train_state(model.params, opt, ema=True)
    step = jax.jit(make_train_step(model._apply_fn, model.config, opt, ema_decay=0.9))

    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    lr = hr[:, ::2, ::2, :]

    k = 'body.0.weight'
    w0 = np.asarray(state.params[k])
    for _ in range(5):
        state, _ = step(state, lr, hr)
    w, e = np.asarray(state.params[k]), np.asarray(state.ema[k])
    # EMA lags the live params but has moved off the init
    assert not np.allclose(e, w)
    assert not np.allclose(e, w0)
    assert np.abs(e - w0).max() < np.abs(w - w0).max()

    # swapped dict keeps non-float buffers and is usable by the model
    ep = ema_params(state)
    assert set(ep) == set(state.params)
    y = model.apply(ep, lr)
    assert y.shape == hr.shape


def test_ema_disabled_by_default():
    model = _model()
    opt = make_optimizer()
    state = init_train_state(model.params, opt)
    assert state.ema is None
    assert ema_params(state) is state.params


def test_train_step_with_buffer_donation():
    """The step must be donate-safe: jit(donate_argnums=0) result matches a
    fresh undonated run (SURVEY.md §5 race-detection row)."""
    model = _model()
    opt = make_optimizer(lr=1e-3)
    step_plain = jax.jit(make_train_step(model._apply_fn, model.config, opt))
    step_donate = jax.jit(make_train_step(model._apply_fn, model.config, opt), donate_argnums=(0,))

    rng = np.random.default_rng(1)
    hr = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    lr = hr[:, ::2, ::2, :]

    s1 = init_train_state(model.params, opt)
    s1, m1 = step_plain(s1, lr, hr)
    s2 = init_train_state(model.params, opt)
    s2, m2 = step_donate(s2, lr, hr)

    assert float(m1['loss']) == pytest.approx(float(m2['loss']), rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.params['body.0.weight']),
        np.asarray(s2.params['body.0.weight']),
        rtol=1e-6,
    )
    # donated state is consumed; the returned one keeps working
    s2, _ = step_donate(s2, lr, hr)
    assert int(s2.step) == 2


def test_train_state_checkpoint_resume(tmp_path):
    """Exact resume: save mid-training, restore, and the next step matches."""
    model = _model()
    opt = make_optimizer(lr=1e-3)
    step = jax.jit(make_train_step(model._apply_fn, model.config, opt, ema_decay=0.9))

    rng = np.random.default_rng(3)
    hr = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    lr = hr[:, ::2, ::2, :]

    state = init_train_state(model.params, opt, ema=True)
    for _ in range(3):
        state, _ = step(state, lr, hr)

    from resselt_tpu.train import load_train_state, save_train_state

    ckpt = str(tmp_path / 'ckpt')
    save_train_state(state, ckpt)

    template = init_train_state(model.params, opt, ema=True)
    restored = load_train_state(ckpt, template)
    assert int(restored.step) == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params['body.0.weight']),
        np.asarray(state.params['body.0.weight']),
    )
    np.testing.assert_array_equal(
        np.asarray(restored.ema['body.0.weight']), np.asarray(state.ema['body.0.weight'])
    )

    s1, m1 = step(state, lr, hr)
    s2, m2 = step(restored, lr, hr)
    assert float(m1['loss']) == float(m2['loss'])
    np.testing.assert_array_equal(
        np.asarray(s1.params['body.0.weight']), np.asarray(s2.params['body.0.weight'])
    )


def test_train_step_remat_matches_plain():
    """remat=True recomputes activations in the backward pass; gradients —
    and therefore the updated state — must match the plain step exactly."""
    model = _model()
    opt = make_optimizer(lr=1e-2)
    rng = np.random.default_rng(3)
    hr = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    lr = hr[:, ::2, ::2, :]

    outs = {}
    for remat in (False, True):
        state = init_train_state(model.params, opt)
        step = jax.jit(make_train_step(model._apply_fn, model.config, opt, remat=remat))
        for _ in range(2):
            state, metrics = step(state, lr, hr)
        outs[remat] = (state, metrics)
    for k in outs[False][0].params:
        np.testing.assert_allclose(
            np.asarray(outs[True][0].params[k]), np.asarray(outs[False][0].params[k]),
            rtol=1e-5, atol=1e-6, err_msg=k)
    assert float(outs[True][1]['loss']) == pytest.approx(float(outs[False][1]['loss']), rel=1e-5)


def test_train_export_oracle_roundtrip(tmp_path):
    """Close the write-path loop with the torch ecosystem: train a few
    steps, export the trained params to .safetensors, run the exported
    file BOTH back through our own detection (convert CLI round-trip) AND
    into the torch reference model — forward outputs must agree.

    The reference ingests safetensors state dicts directly
    (resselt/registry.py:97-100); our params are already checkpoint-keyed
    torch layouts (conv OIHW), so the exported file must be a drop-in
    torch checkpoint."""
    from tests.torch_ref import run_torch

    model = _model()  # compact: num_feat=16, num_conv=2, upscale=2
    opt = make_optimizer(lr=1e-3)
    state = init_train_state(model.params, opt)
    step = jax.jit(make_train_step(model._apply_fn, model.config, opt))
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    lr = hr[:, ::2, ::2, :]
    for _ in range(3):
        state, _ = step(state, lr, hr)

    from resselt_tpu.io import write_safetensors

    trained = str(tmp_path / 'trained.safetensors')
    write_safetensors(state.params, trained, metadata={'arch': model.arch_id})

    # our registry re-detects + reloads the exported file (convert CLI)
    from resselt_tpu.convert import main as convert_main

    assert convert_main([trained, str(tmp_path / 'rt.npz')]) == 0
    from resselt_tpu.cache import load_model

    ours = load_model(str(tmp_path / 'rt.npz'))
    assert ours.arch_id == 'Compact'

    # the torch reference ingests the exported file with identical output
    import torch
    from safetensors.torch import load_file

    from resselt.archs.compact.arch import SRVGGNetCompact

    ref = SRVGGNetCompact(num_feat=16, num_conv=2, upscale=2).eval()
    ref.load_state_dict(load_file(trained), strict=True)
    x = np.random.default_rng(5).random((1, 20, 24, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(ours(x[0]))[None]
    err = np.abs(got - want).max()
    assert err < 1e-5, f'train->export->oracle parity: max err {err}'
