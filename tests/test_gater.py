"""Parity tests for GateR vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


@pytest.mark.parametrize('latent_att', [False, True])
def test_gater(latent_att):
    from resselt.archs.gater.arch import GateR

    ref = init_random(
        GateR(dim=16, in_ch=3, num_blocks=(1, 1, 1, 2, 1, 1, 1), latent_att=latent_att), 161
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'GateR'
    assert model.metadata.upscale == 1
    assert model.config.latent_att is latent_att
    x = np.random.default_rng(3).random((1, 21, 26, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'gater: max err {err}'
