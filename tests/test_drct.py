"""Parity tests for DRCT vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 2e-3


@pytest.mark.parametrize('upscale,img_size', [(2, 32), (4, 32)])
def test_drct(upscale, img_size):
    from resselt.archs.drct.arch import DRCT

    ref = init_random(
        DRCT(img_size=img_size, in_chans=3, embed_dim=24, depths=(6, 6), num_heads=(3, 3),
             window_size=8, mlp_ratio=2.0, upscale=upscale, img_range=1.0,
             upsampler='pixelshuffle', gc=8), 71
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'DRCT'
    assert model.metadata.upscale == upscale
    x = np.random.default_rng(3).random((1, 21, 19, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'drct: max err {err}'
