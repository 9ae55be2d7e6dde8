"""Parity tests for SMoSR vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


@pytest.mark.parametrize('rep,upsampler,scale', [
    (False, 'pixelshuffledirect', 2),
    (True, 'pixelshuffledirect', 2),
    (False, 'pa_up', 4),
    (False, 'dysample', 2),
])
def test_smosr(rep, upsampler, scale):
    from resselt.archs.smosr.arch import SMoSR

    ref = init_random(
        SMoSR(in_ch=3, out_ch=3, dim=16, scale=scale, rep=rep, n_mb=2,
              upsampler=upsampler, upsampler_mid_dim=8, d_kernel=3), 131
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'SMoSR'
    assert model.metadata.upscale == scale
    assert model.config.rep is rep
    x = np.random.default_rng(3).random((1, 14, 18, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'smosr rep={rep} {upsampler}: max err {err}'
