"""Parity tests for MoSRv2 / MoESR vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 5e-4


def _check(ref, x, expect_id, expect_upscale):
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == expect_id
    assert model.metadata.upscale == expect_upscale
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'{expect_id}: max err {err}'
    return model


@pytest.mark.parametrize('upsampler,scale,unshuffle,rms', [
    ('pixelshuffledirect', 2, False, False),
    ('pixelshuffle', 4, False, True),
    ('nearest+conv', 2, False, False),
    ('dysample', 2, False, True),
    ('conv', 1, False, False),
    ('pixelshuffledirect', 2, True, True),
    ('pixelshuffledirect', 3, False, False),
])
def test_mosrv2(upsampler, scale, unshuffle, rms):
    from resselt.archs.mosrv2.arch import MoSRv2

    ref = init_random(
        MoSRv2(in_ch=3, scale=scale, n_block=2, dim=16, upsampler=upsampler,
               expansion_ratio=1.5, mid_dim=32, unshuffle_mod=unshuffle, rms_norm=rms), 11
    ).eval()
    x = np.random.default_rng(0).random((1, 11, 13, 3), dtype=np.float32)
    expect_scale = 1 if (upsampler == 'conv' and not unshuffle) else scale
    _check(ref, x, 'MoSRv2', scale if unshuffle or upsampler != 'conv' else scale)


@pytest.mark.parametrize('upsampler,scale', [('pixelshuffledirect', 2), ('dysample', 4), ('conv', 1)])
def test_moesr(upsampler, scale):
    from resselt.archs.moesr.arch import MoESR

    ref = init_random(
        MoESR(in_ch=3, out_ch=3, scale=scale, dim=16, n_blocks=2, n_block=2,
              expansion_factor=1.5, expansion_msg=1.5, upsampler=upsampler, upsample_dim=16), 12
    ).eval()
    x = np.random.default_rng(0).random((1, 10, 9, 3), dtype=np.float32)
    _check(ref, x, 'MoESR', scale if upsampler != 'conv' else 1)


@pytest.mark.parametrize('scale,unshuffle,dccm,se', [
    (2, False, True, True),
    (2, True, True, False),
    (4, False, False, True),
    (1, False, True, True),
])
def test_rtmosr(scale, unshuffle, dccm, se):
    from resselt.archs.rtmosr.arch import RTMoSR

    ref = init_random(
        RTMoSR(scale=scale, dim=16, ffn_expansion=2, n_blocks=2,
               unshuffle_mod=unshuffle, dccm=dccm, se=se), 13
    ).eval()
    x = np.random.default_rng(0).random((1, 11, 13, 3), dtype=np.float32)
    model = _check(ref, x, 'RTMoSR', scale)
    assert model.config.dccm is dccm and model.config.se is se
