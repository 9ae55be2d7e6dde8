"""Parity tests for LAWFFT vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


@pytest.mark.parametrize('scale,upsampler', [(2, 'pixelshuffledirect'), (4, 'pixelshuffle')])
def test_lawfft(scale, upsampler):
    from resselt.archs.lawfft.arch import LAWFFT

    ref = init_random(
        LAWFFT(in_ch=3, dim=16, split=0.25, scale=scale, n_rblock=1, n_mblock=2,
               t_mid_factor=1.0, window_size=8, mlp_factor=2.0,
               unshuffle_mod=False, upsampler=upsampler, mid_dim=16), 181
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'LAWFFT'
    assert model.metadata.upscale == scale
    x = np.random.default_rng(3).random((1, 13, 19, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'lawfft: max err {err}'


def test_lawfft_unshuffle():
    from resselt.archs.lawfft.arch import LAWFFT

    ref = init_random(
        LAWFFT(in_ch=3, dim=16, split=0.25, scale=2, n_rblock=1, n_mblock=2,
               t_mid_factor=1.0, window_size=8, mlp_factor=2.0,
               unshuffle_mod=True, upsampler='pixelshuffledirect', mid_dim=16), 182
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.metadata.upscale == 2
    assert model.config.unshuffle == 2
    # unshuffle path: the reference crops with the internal scale 4, so only
    # pad-aligned inputs agree
    x = np.random.default_rng(3).random((1, 16, 32, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    assert max_err(got, want) < TOL
