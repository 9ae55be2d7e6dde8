"""Parity tests for nn/blocks.py vs the reference block factories
(resselt/utilities/block.py:17-274,477-537)."""

import numpy as np
import pytest
import torch

from resselt_tpu.nn.params import PTree
from tests.torch_ref import run_torch, state_dict_to_numpy


def _to_jax(sd):
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in state_dict_to_numpy(sd).items()}


def _x(c=8, h=12, w=14, seed=0):
    return np.random.default_rng(seed).standard_normal((2, h, w, c)).astype(np.float32)


def _init(m, seed=0):
    g = torch.Generator().manual_seed(seed)
    for prm in m.parameters():
        with torch.no_grad():
            prm.copy_(torch.randn(prm.shape, generator=g) * 0.1)
    return m


@pytest.mark.parametrize('mode', ['CNA', 'NAC', 'CNAC'])
@pytest.mark.parametrize('act_type', ['relu', 'leakyrelu', 'prelu'])
def test_conv_block_modes(mode, act_type):
    from resselt.utilities import block as B

    from resselt_tpu.nn.blocks import conv_block

    ref = _init(B.conv_block(8, 16, 3, act_type=act_type, mode=mode))
    x = _x()
    want = run_torch(ref, x)

    sd = _to_jax(ref.state_dict())
    # reference sequential indices: locate the conv (4-D weight)
    conv_idx = next(k.split('.')[0] for k, v in sd.items() if v.ndim == 4)
    params = {f'conv.{k.split(".", 1)[1]}' if k.startswith(conv_idx + '.') else k: v
              for k, v in sd.items()}
    # prelu weight (if any) lives at '<i>.weight' with ndim == 1
    for k, v in sd.items():
        if v.ndim == 1 and not k.startswith(conv_idx + '.'):
            params['act.weight'] = v
    got = np.asarray(conv_block(PTree(params), x, 'conv', act_type=act_type, mode=mode))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('pad_type', ['reflect', 'replicate'])
def test_conv_block_pad_types(pad_type):
    from resselt.utilities import block as B

    from resselt_tpu.nn.blocks import conv_block

    ref = _init(B.conv_block(8, 8, 3, pad_type=pad_type, act_type='relu'))
    x = _x()
    want = run_torch(ref, x)
    sd = _to_jax(ref.state_dict())
    conv_idx = next(k.split('.')[0] for k, v in sd.items() if v.ndim == 4)
    params = {f'conv.{k.split(".", 1)[1]}': v for k, v in sd.items() if k.startswith(conv_idx + '.')}
    got = np.asarray(conv_block(PTree(params), x, 'conv', pad_type=pad_type, act_type='relu'))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv_block_batch_norm():
    from resselt.utilities import block as B

    from resselt_tpu.nn.blocks import conv_block

    ref = B.conv_block(8, 16, 3, norm_type='batch', act_type='relu', mode='CNA')
    _init(ref)
    # run a fake training step so running stats are non-trivial
    ref.train()
    with torch.no_grad():
        ref(torch.randn(4, 8, 12, 12, generator=torch.Generator().manual_seed(3)))
    ref.eval()
    x = _x()
    want = run_torch(ref, x)
    sd = _to_jax(ref.state_dict())
    params = {}
    for k, v in sd.items():
        i, rest = k.split('.', 1)
        params[('conv.' if v.ndim == 4 or (v.ndim == 1 and i == '0') else 'norm.') + rest] = v
    got = np.asarray(conv_block(PTree(params), x, 'conv', norm_type='batch',
                                act_type='relu', mode='CNA'))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_concat_shortcut_blocks():
    import jax.numpy as jnp

    from resselt_tpu.nn.blocks import concat_block, shortcut_block

    x = jnp.asarray(_x())
    fn = lambda t: t * 2.0
    assert np.allclose(np.asarray(concat_block(fn, x)),
                       np.concatenate([np.asarray(x), np.asarray(x) * 2], axis=-1))
    assert np.allclose(np.asarray(shortcut_block(fn, x)), np.asarray(x) * 3)


@pytest.mark.parametrize('mode,res_scale', [('CNA', 1.0), ('CNA', 0.1), ('NAC', 1.0), ('CNAC', 1.0)])
def test_resnet_block(mode, res_scale):
    from resselt.utilities import block as B

    from resselt_tpu.nn.blocks import resnet_block

    ref = _init(B.ResNetBlock(8, 8, 8, mode=mode, res_scale=res_scale))
    x = _x()
    want = run_torch(ref, x)
    params = _to_jax(ref.state_dict())
    got = np.asarray(resnet_block(PTree(params), x, mode=mode, res_scale=res_scale))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pixelshuffle_and_upconv_blocks():
    from resselt.utilities import block as B

    from resselt_tpu.nn.blocks import pixelshuffle_block, upconv_block

    ref = _init(B.pixelshuffle_block(8, 4, 2, act_type='relu'))
    x = _x()
    want = run_torch(ref, x)
    params = _to_jax(ref.state_dict())
    got = np.asarray(pixelshuffle_block(PTree(params), x, 2, conv_name='0', act_type='relu'))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    ref2 = _init(B.upconv_block(8, 4, 2, act_type='relu'), seed=1)
    want2 = run_torch(ref2, x)
    params2 = _to_jax(ref2.state_dict())
    got2 = np.asarray(upconv_block(PTree(params2), x, 2, conv_name='1', act_type='relu'))
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)
