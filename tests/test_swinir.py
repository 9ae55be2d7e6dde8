"""Parity tests for SwinIR vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 2e-3  # transformer stacks accumulate more f32 noise


def _make(upsampler, upscale, window_size=8, embed_dim=24, depths=(2, 2), heads=(3, 3), img_size=32, **kw):
    from resselt.archs.swinir.arch import SwinIR

    m = SwinIR(
        img_size=img_size, in_chans=3, embed_dim=embed_dim, depths=list(depths),
        num_heads=list(heads), window_size=window_size, mlp_ratio=2.0,
        upscale=upscale, img_range=1.0, upsampler=upsampler, **kw,
    )
    return init_random(m, 41).eval()


@pytest.mark.parametrize('upsampler,upscale', [
    ('pixelshuffle', 2), ('pixelshuffle', 4), ('pixelshuffledirect', 3),
    ('nearest+conv', 4), ('', 1),
])
def test_swinir_variants(upsampler, upscale):
    ref = _make(upsampler, upscale)
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'SwinIR'
    assert model.metadata.upscale == upscale
    assert model.config.upsampler == upsampler
    # odd size exercises pad-to-window + shifted masks for padded geometry
    x = np.random.default_rng(3).random((1, 21, 27, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'swinir {upsampler}: max err {err}'


def test_swinir_3conv_resi():
    ref = _make('pixelshuffle', 2, resi_connection='3conv')
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.config.resi_connection == '3conv'
    x = np.random.default_rng(3).random((1, 16, 16, 3), dtype=np.float32)
    assert max_err(np.asarray(model(x)), run_torch(ref, x)) < TOL


def test_swinir_window7_img_range():
    """window 7 -> img_range 255 heuristic (reference swinir/__init__.py:90)."""
    ref = _make('', 1, window_size=7, img_size=28)
    ref.img_range = 255.0
    ref.mean = ref.mean  # rgb mean path
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.config.img_range == 255.0
    x = np.random.default_rng(3).random((1, 14, 15, 3), dtype=np.float32)
    assert max_err(np.asarray(model(x)), run_torch(ref, x)) < TOL
