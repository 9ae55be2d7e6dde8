"""Parity tests for RGT vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 2e-3


@pytest.mark.parametrize('scale,split', [(2, (4, 4)), (4, (2, 8))])
def test_rgt(scale, split):
    from resselt.archs.rgt.arch import RGT

    ref = init_random(
        RGT(img_size=16, in_chans=3, embed_dim=24, depth=[4], num_heads=[2],
            mlp_ratio=2.0, upscale=scale, resi_connection='1conv',
            split_size=list(split), c_ratio=0.5), 101
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'RGT'
    assert model.metadata.upscale == scale
    assert model.config.split_size == split
    # RG_SA eval recursion needs H,W >= 64 to exercise _time > 2? keep small but valid
    x = np.random.default_rng(3).random((1, 64, 64, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'rgt: max err {err}'


def test_rgt_odd_size():
    from resselt.archs.rgt.arch import RGT

    ref = init_random(
        RGT(img_size=16, in_chans=3, embed_dim=24, depth=[2], num_heads=[2],
            mlp_ratio=2.0, upscale=2, resi_connection='3conv',
            split_size=[4, 4], c_ratio=0.5), 102
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    x = np.random.default_rng(4).random((1, 50, 38, 3), dtype=np.float32)
    assert max_err(np.asarray(model(x)), run_torch(ref, x)) < TOL
