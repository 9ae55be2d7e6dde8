"""Pipeline-parallel and expert-parallel executors vs sequential references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resselt_tpu.nn import functional as F
from resselt_tpu.parallel import (
    init_moe_params,
    moe_apply_dense,
    moe_apply_ep,
    pipeline_apply,
    shard_moe_params,
    shard_stacked_params,
    stack_stages,
)
from resselt_tpu.parallel.mesh import make_mesh


def _pp_mesh(n):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ('pp',))


def _conv_stage(params, x):
    y = F.conv2d(x, params['w'], params['b'], padding=1)
    return jnp.where(y >= 0, y, params['alpha'] * y)


def _make_stage(rng, feat):
    return {
        'w': jnp.asarray(rng.standard_normal((feat, feat, 3, 3), np.float32) * 0.1),
        'b': jnp.asarray(rng.standard_normal((feat,), np.float32) * 0.1),
        'alpha': jnp.asarray(np.float32(0.25)),
    }


@pytest.mark.parametrize('n_stages,m', [(4, 4), (4, 8), (2, 2)])
def test_pipeline_matches_sequential(n_stages, m):
    if len(jax.devices()) < n_stages:
        pytest.skip('not enough devices')
    rng = np.random.default_rng(0)
    feat = 8
    stages = [_make_stage(rng, feat) for _ in range(n_stages)]
    x = jnp.asarray(rng.standard_normal((m * 2, 12, 12, feat), np.float32))

    ref = x
    for s in stages:
        ref = _conv_stage(s, ref)

    mesh = _pp_mesh(n_stages)
    stacked = shard_stacked_params(stack_stages(stages), mesh, 'pp')
    out = pipeline_apply(_conv_stage, stacked, x, mesh, axis='pp', num_microbatches=m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipeline_jits():
    n = min(4, len(jax.devices()))
    rng = np.random.default_rng(1)
    stages = [_make_stage(rng, 8) for _ in range(n)]
    mesh = _pp_mesh(n)
    stacked = shard_stacked_params(stack_stages(stages), mesh, 'pp')
    x = jnp.asarray(rng.standard_normal((n, 8, 8, 8), np.float32))

    f = jax.jit(lambda p, xi: pipeline_apply(_conv_stage, p, xi, mesh, axis='pp'))
    ref = x
    for s in stages:
        ref = _conv_stage(s, ref)
    np.testing.assert_allclose(np.asarray(f(stacked, x)), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_moe_ep_matches_dense():
    from jax.sharding import Mesh

    n = min(4, len(jax.devices()))
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ('ep',))
    params = init_moe_params(jax.random.PRNGKey(0), d=16, d_hidden=32, n_experts=2 * n)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((64, 16), np.float32))

    dense = moe_apply_dense(params, x)
    sharded = shard_moe_params(params, mesh, 'ep')
    ep = moe_apply_ep(sharded, x, mesh, 'ep')
    np.testing.assert_allclose(np.asarray(ep), np.asarray(dense), rtol=2e-5, atol=2e-5)


def test_moe_ep_rejects_indivisible():
    from jax.sharding import Mesh

    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip('needs >=2 devices')
    mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ('ep',))
    params = init_moe_params(jax.random.PRNGKey(0), d=8, d_hidden=8, n_experts=n + 1)
    with pytest.raises(ValueError):
        moe_apply_ep(params, jnp.zeros((4, 8)), mesh, 'ep')


def test_pipeline_esrgan_matches_sequential():
    """A real registered model through the pp executor (not synthetic
    stages): ESRGAN's RRDB trunk split over 4 pipeline stages, with 6
    blocks on 4 stages exercising the masked-padding path."""
    import resselt_tpu
    from resselt_tpu.archs.esrgan import apply_pipelined
    from resselt_tpu.zoo import make_esrgan

    n = 4
    if len(jax.devices()) < n:
        pytest.skip('not enough devices')
    model = resselt_tpu.load_from_state_dict(
        make_esrgan(num_filters=16, num_blocks=6, scale=2)
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((4, 24, 24, 3), dtype=np.float32))

    ref = np.asarray(model(x))
    mesh = _pp_mesh(n)
    out = apply_pipelined(model.config, model.params, x, mesh, axis='pp')
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_pipeline_esrgan_jits_divisible():
    """Same trunk, jitted, with a block count that divides the stage count
    (no padding) and more microbatches than stages."""
    import resselt_tpu
    from resselt_tpu.archs.esrgan import apply_pipelined
    from resselt_tpu.zoo import make_esrgan

    n = 2
    if len(jax.devices()) < n:
        pytest.skip('not enough devices')
    model = resselt_tpu.load_from_state_dict(
        make_esrgan(num_filters=16, num_blocks=4, scale=2)
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((8, 16, 16, 3), dtype=np.float32))
    ref = np.asarray(model(x))
    mesh = _pp_mesh(n)
    f = jax.jit(lambda p, xi: apply_pipelined(model.config, p, xi, mesh, axis='pp', num_microbatches=4))
    out = f(model.params, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
