"""Parity tests for CUGAN variants vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 5e-4


@pytest.mark.parametrize('variant,scale,pro', [
    ('2x', 2, False), ('2x', 2, True), ('3x', 3, False), ('4x', 4, True), ('fast', 2, False),
])
def test_cugan(variant, scale, pro):
    from resselt.archs.cugan.arch import UpCunet2x, UpCunet2x_fast, UpCunet3x, UpCunet4x

    if variant == '2x':
        ref = UpCunet2x(pro=pro)
    elif variant == '3x':
        ref = UpCunet3x(pro=pro)
    elif variant == '4x':
        ref = UpCunet4x(pro=pro)
    else:
        ref = UpCunet2x_fast()
    ref = init_random(ref, 31).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'CuGAN'
    assert model.metadata.upscale == scale
    size = (1, 43, 47, 3) if variant == 'fast' else (1, 21, 27, 3)
    x = np.random.default_rng(0).random(size, dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'cugan {variant}: max err {err}'
