"""Parity tests for GateRV3 vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


@pytest.mark.parametrize('scale,attention,upsampler', [
    (1, False, 'conv'),
    (2, True, 'pixelshuffledirect'),
    (2, False, 'dysample'),
    # pa_up's PA gate has a 'conv.0.weight' key that must NOT be mistaken
    # for a Conv3XC bundle by the collapse marker (regression: KeyError)
    (2, False, 'pa_up'),
    (4, False, 'pa_up'),
])
def test_gaterv3(scale, attention, upsampler):
    from resselt.archs.gaterv3.arch import GateRV3

    ref = init_random(
        GateRV3(in_ch=3, dim=16, enc_blocks=(1, 1), dec_blocks=(1, 1), num_latent=1,
                scale=scale, upsample=upsampler, upsample_mid_dim=16,
                attention=attention, span_blocks=1, end_kernel=3), 221
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'GateRV3'
    assert model.metadata.upscale == scale
    assert model.config.attention is attention
    x = np.random.default_rng(3).random((1, 13, 18, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'gaterv3: max err {err}'
