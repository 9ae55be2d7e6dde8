"""Parity tests for OmniSR vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


@pytest.mark.parametrize('pe,scale,res_num', [(True, 2, 1), (False, 4, 2)])
def test_omni(pe, scale, res_num):
    from resselt.archs.omni.arch import OmniSR

    ref = init_random(
        OmniSR(num_in_ch=3, num_out_ch=3, num_feat=16, block_num=1, pe=pe,
               window_size=8, res_num=res_num, up_scale=scale, bias=True), 61
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'OmniSR'
    assert model.metadata.upscale == scale
    assert model.config.pe is pe
    x = np.random.default_rng(3).random((1, 22, 18, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'omni: max err {err}'
