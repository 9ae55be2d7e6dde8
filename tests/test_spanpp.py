"""Parity tests for SpanPP vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 5e-4


def test_spanpp():
    from resselt.archs.spanpp.arch import SpanPP

    ref = init_random(
        SpanPP(num_in_ch=3, feature_channels=16, scale_list=(1, 2, 3, 4),
               eval_base_scale=2, ig_kernel_size=3, implicit_dim=32, latent_layers=2), 121
    )
    ref = ref.eval()  # triggers eval_convs synthesis in IGConv.train()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'SpanPP'
    assert list(model.metadata.upscale) == [1, 2, 3, 4]
    x = np.random.default_rng(3).random((1, 14, 18, 3), dtype=np.float32)
    want = run_torch(ref, x)  # default scale = base 2
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'spanpp: max err {err}'


def test_spanpp_scale_override_narrows_metadata_for_tiled():
    """with_config(eval_scale=s) must narrow metadata.upscale from the
    checkpoint's scale list to the int actually produced, so the tiled /
    padded drivers (which require an integer upscale) accept the model —
    the CLI's --scale combined with --tile crashed before this."""
    from resselt.archs.spanpp.arch import SpanPP

    from resselt_tpu.parallel import upscale_tiled

    ref = init_random(
        SpanPP(num_in_ch=3, feature_channels=16, scale_list=(1, 2, 3, 4),
               eval_base_scale=2, ig_kernel_size=3, implicit_dim=32, latent_layers=2), 121
    ).eval()
    model = resselt_tpu.load_from_state_dict(state_dict_to_numpy(ref.state_dict()))
    m3 = model.with_config(eval_scale=3)
    assert m3.metadata.upscale == 3
    x = np.random.default_rng(5).random((20, 24, 3), dtype=np.float32)
    full = np.asarray(m3(x))
    tiled = np.asarray(upscale_tiled(m3, x, tile=16, halo=4))
    assert tiled.shape == full.shape == (60, 72, 3)
    assert max_err(tiled, full) < TOL


@pytest.mark.parametrize('scale', [1, 3, 4])
def test_spanpp_arbitrary_scale(scale):
    """with_config(eval_scale=s) runs any scale in the checkpoint's list,
    matching the reference's forward(x, scale) (spanpp/arch.py:358-373)."""
    from resselt.archs.spanpp.arch import SpanPP

    ref = init_random(
        SpanPP(num_in_ch=3, feature_channels=16, scale_list=(1, 2, 3, 4),
               eval_base_scale=2, ig_kernel_size=3, implicit_dim=32, latent_layers=2), 121
    )
    ref = ref.eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd).with_config(eval_scale=scale)
    x = np.random.default_rng(4).random((1, 14, 18, 3), dtype=np.float32)
    want = run_torch(ref, x, scale)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'spanpp@{scale}x: max err {err}'
