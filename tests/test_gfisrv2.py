"""Parity tests for GFISRV2 vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


@pytest.mark.parametrize('unshuffle,scale,upsampler', [
    (False, 4, 'pixelshuffledirect'),
    (False, 2, 'transpose+conv'),
    (True, 2, 'pixelshuffledirect'),
])
def test_gfisrv2(unshuffle, scale, upsampler):
    from resselt.archs.gfisrv2.arch import GFISRV2

    ref = init_random(
        GFISRV2(in_nc=3, dim=16, expansion_ratio=1.5, scale=scale, out_nc=3,
                upsampler=upsampler, mid_dim=16, pixel_unshuffle=unshuffle, n_blocks=5), 201
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'GFISRV2'
    assert model.metadata.upscale == scale
    # the reference always crops with scale 4 (arch.py self.scale = 4), so
    # use inputs where that is a no-op / aligned
    x = np.random.default_rng(3).random((1, 16, 20, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape[1] >= 16 * scale - 1
    err = max_err(got[:, : 16 * scale, : 20 * scale], want[:, : 16 * scale, : 20 * scale])
    assert err < TOL, f'gfisrv2: max err {err}'


@pytest.mark.parametrize('in_nc,scale', [(4, 2), (1, 1)])
def test_gfisrv2_unshuffle_nonrgb(in_nc, scale):
    """Same %16 ambiguity as GFISR: cin=16 is both 4ch@2x and 1ch@1x;
    MetaUpsample out_ch disambiguates (regression)."""
    from resselt.archs.gfisrv2.arch import GFISRV2

    ref = init_random(
        GFISRV2(in_nc=in_nc, dim=16, expansion_ratio=1.5, scale=scale, out_nc=in_nc,
                upsampler='pixelshuffledirect', mid_dim=16, pixel_unshuffle=True,
                n_blocks=4), 79
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.metadata.upscale == scale
    assert model.metadata.in_channels == in_nc
    x = np.random.default_rng(5).random((1, 16, 20, in_nc), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    assert max_err(got, want) < TOL
