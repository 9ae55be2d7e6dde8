"""Parity tests for RCAN and EIMN vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 5e-4


def _check(ref, x, expect_id, expect_upscale):
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == expect_id
    assert model.metadata.upscale == expect_upscale
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'{expect_id}: max err {err}'
    return model


@pytest.mark.parametrize('scale,norm,unshuffle', [
    (2, True, False), (4, False, False), (3, True, False), (2, True, True), (1, False, True),
])
def test_rcan(scale, norm, unshuffle):
    from resselt.archs.rcan.arch import RCAN

    ref = init_random(
        RCAN(scale=scale, n_resgroups=2, n_resblocks=2, n_feats=16,
             norm=norm, reduction=4, unshuffle_mod=unshuffle), 21
    ).eval()
    if norm:
        # restore the fixed MeanShift weights clobbered by init_random
        import torch
        rgb_mean = (0.4488, 0.4371, 0.4040)
        for mod, sign in ((ref.sub_mean, -1), (ref.add_mean, 1)):
            mod.weight.data = torch.eye(3).view(3, 3, 1, 1)
            mod.bias.data = sign * 255 * torch.Tensor(rgb_mean)
    x = np.random.default_rng(0).random((1, 11, 13, 3), dtype=np.float32)
    _check(ref, x, 'RCAN', scale)


def test_eimn():
    from resselt.archs.eimn.arch import eimn

    ref = init_random(eimn(embed_dims=16, scale=2, depths=2, mlp_ratios=1.5, num_stages=2), 22).eval()
    # randomize BN running stats too (init_random only touches parameters)
    import torch
    g = torch.Generator().manual_seed(5)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    x = np.random.default_rng(0).random((1, 12, 14, 3), dtype=np.float32)
    _check(ref, x, 'eimn', 2)
