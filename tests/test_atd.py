"""Parity tests for ATD vs the torch reference oracle."""

import numpy as np
import pytest
import torch

import resselt_tpu
from tests.torch_ref import max_err, run_torch, state_dict_to_numpy

TOL = 2e-3


def _init(model, seed, std=0.5):
    g = torch.Generator().manual_seed(seed)
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * std / max(1, p.shape[-1]) ** 0.5)
    return model


@pytest.mark.parametrize('upsampler,scale,embed_dim,cat', [
    ('pixelshuffle', 2, 24, 256),
    ('pixelshuffledirect', 4, 48, 128),  # "light" heuristic path
    ('', 1, 24, 256),
])
def test_atd(upsampler, scale, embed_dim, cat):
    from resselt.archs.atd.arch import ATD

    ref = _init(
        ATD(in_chans=3, embed_dim=embed_dim, depths=(2,), num_heads=(3,), window_size=8,
            category_size=cat, num_tokens=16, reducted_dim=4, convffn_kernel_size=5,
            mlp_ratio=1.0, upscale=scale, upsampler=upsampler, img_range=1.0).eval(), 111
    )
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'ATD'
    assert model.metadata.upscale == scale
    assert model.config.category_size == cat
    x = np.random.default_rng(3).random((1, 19, 21, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'atd {upsampler}: max err {err}'
