"""Parity tests for GFISR vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


@pytest.mark.parametrize('fft_mode,unshuffle,scale,upsampler', [
    (True, False, 4, 'pixelshuffledirect'),
    (False, False, 2, 'pa_up'),
    (True, True, 2, 'pixelshuffledirect'),
    (True, True, 1, 'conv'),
])
def test_gfisr(fft_mode, unshuffle, scale, upsampler):
    from resselt.archs.gfisr.arch import GFISR

    ref = init_random(
        GFISR(in_nc=3, dim=16, expansion_ratio=1.5, fft_mode=fft_mode, scale=scale,
              out_nc=3, upsampler=upsampler, mid_dim=16,
              pixel_unshuffle=unshuffle, n_blocks=6), 191
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'GFISR'
    assert model.metadata.upscale == scale
    assert model.config.fft_mode is fft_mode
    x = np.random.default_rng(3).random((1, 14, 18, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'gfisr: max err {err}'


@pytest.mark.parametrize('in_nc,scale', [(4, 2), (1, 1)])
def test_gfisr_unshuffle_nonrgb(in_nc, scale):
    """4-channel scale-2 and 1-channel scale-1 unshuffle stems both have
    cin=16; the bare %16 heuristic misclassified the former as the latter
    (regression: opaque conv channel mismatch at trace).  out_ch from
    MetaUpsample disambiguates."""
    from resselt.archs.gfisr.arch import GFISR

    ref = init_random(
        GFISR(in_nc=in_nc, dim=16, expansion_ratio=1.5, fft_mode=True, scale=scale,
              out_nc=in_nc, upsampler='pixelshuffledirect', mid_dim=16,
              pixel_unshuffle=True, n_blocks=4), 77
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.metadata.upscale == scale
    assert model.metadata.in_channels == in_nc
    x = np.random.default_rng(5).random((1, 14, 18, in_nc), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    assert max_err(got, want) < TOL
