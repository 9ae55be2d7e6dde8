"""Parity tests for DAT vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 2e-3


@pytest.mark.parametrize('upsampler,scale,split', [
    ('pixelshuffle', 2, (2, 4)),
    ('pixelshuffledirect', 4, (4, 8)),
])
def test_dat(upsampler, scale, split):
    import torch

    from resselt.archs.dat.arch import DAT

    ref = init_random(
        DAT(img_size=16, in_chans=3, embed_dim=24, split_size=list(split),
            depth=[4], num_heads=[2], expansion_factor=2.0, upscale=scale,
            resi_connection='1conv', upsampler=upsampler), 91
    ).eval()
    # randomize BN running stats
    g = torch.Generator().manual_seed(5)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'dat'
    assert model.metadata.upscale == scale
    assert model.config.split_size == split
    x = np.random.default_rng(3).random((1, 18, 22, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'dat: max err {err}'
