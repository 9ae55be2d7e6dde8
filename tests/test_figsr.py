"""Parity tests for FIGSR vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


@pytest.mark.parametrize('scale,upsampler', [(4, 'pixelshuffledirect'), (2, 'pixelshuffle')])
def test_figsr(scale, upsampler):
    import torch

    from resselt.archs.figsr.arch import FIGSR

    ref = init_random(
        FIGSR(in_nc=3, dim=16, expansion_ratio=2.0, scale=scale, out_nc=3,
              upsampler=upsampler, mid_dim=16, n_blocks=2, gc=4,
              square_kernel_size=5, band_kernel_size=7), 211
    ).eval()
    # restore the non-trainable eps/rms buffers clobbered by init_random
    for name, m in ref.named_modules():
        if hasattr(m, 'eps') and isinstance(getattr(m, 'eps', None), torch.nn.Parameter):
            with torch.no_grad():
                m.eps.copy_(torch.ones(1) * 1e-6)
                m.rms.copy_(torch.ones(1) * (m.scale.shape[0] ** -0.5))
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'FIGSR'
    assert model.metadata.upscale == scale
    x = np.random.default_rng(3).random((1, 15, 18, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'figsr: max err {err}'
