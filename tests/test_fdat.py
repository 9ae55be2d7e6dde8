"""Parity tests for FDAT vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


@pytest.mark.parametrize('upsampler,scale,unshuffle', [
    ('pixelshuffledirect', 2, False),
    ('transpose+conv', 4, False),
    ('transpose+conv', 2, False),
    ('pa_up', 4, False),
    ('lda', 2, False),
    ('dysample', 2, False),
    ('pixelshuffledirect', 2, True),
    ('conv', 1, False),
    # scale 1 with a non-conv upsampler: reference builds a single conv
    # regardless of mode (fdat/arch.py:304) — the checkpoint has only
    # '0.weight' even though MetaUpsample records dysample/lda
    ('dysample', 1, False),
    ('lda', 1, False),
])
def test_fdat(upsampler, scale, unshuffle):
    from resselt.archs.fdat.arch import FDAT

    ref = init_random(
        FDAT(num_in_ch=3, num_out_ch=3, scale=scale, embed_dim=32, num_groups=1,
             depth_per_group=1, num_heads=4, window_size=8, ffn_expansion_ratio=1.5,
             aim_reduction_ratio=8, mid_dim=32, upsampler_type=upsampler,
             unshuffle_mod=unshuffle), 81
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'FDAT'
    expect_scale = scale if upsampler != 'conv' or unshuffle else 1
    x = np.random.default_rng(3).random((1, 17, 21, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'fdat {upsampler}: max err {err}'
