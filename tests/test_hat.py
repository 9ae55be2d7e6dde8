"""Parity tests for HAT vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 2e-3


@pytest.mark.parametrize('upscale,window,overlap', [(2, 8, 0.5), (4, 8, 0.5), (2, 16, 0.5)])
def test_hat(upscale, window, overlap):
    from resselt.archs.hat.arch import HAT

    ref = init_random(
        HAT(img_size=32, embed_dim=24, depths=(2, 2), num_heads=(3, 3),
            window_size=window, compress_ratio=3, squeeze_factor=8, overlap_ratio=overlap,
            mlp_ratio=2.0, upscale=upscale, img_range=1.0), 51
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'HAT'
    assert model.metadata.upscale == upscale
    assert model.config.window_size == window
    x = np.random.default_rng(3).random((1, 21, 19, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'hat: max err {err}'
