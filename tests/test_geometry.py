"""Geometry sweep: odd input sizes through every pad/crop convention.

SURVEY.md §2.3.5 catalogs 14 distinct pad/crop rules; parity dies here
first (§7.4.3). Each family's arch test already covers one odd size; this
sweep drives several shapes through representatives of each geometry class.
"""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

SIZES = [(8, 8), (13, 17), (24, 9), (31, 33)]


def _sweep(ref, expect_id, tol=2e-3, sizes=SIZES):
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == expect_id
    for h, w in sizes:
        x = np.random.default_rng(h * w).random((1, h, w, 3), dtype=np.float32)
        want = run_torch(ref, x)
        got = np.asarray(model(x))
        assert got.shape == want.shape, f'{expect_id} {h}x{w}: {got.shape} vs {want.shape}'
        err = max_err(got, want)
        assert err < tol, f'{expect_id} {h}x{w}: max err {err}'


def test_geometry_window_reflect_pad():
    """SwinIR: pad_to_multiple(window, reflect) + crop."""
    from resselt.archs.swinir.arch import SwinIR

    ref = init_random(SwinIR(img_size=32, embed_dim=16, depths=[2], num_heads=[2], window_size=8,
                             mlp_ratio=1.0, upscale=2, upsampler='pixelshuffledirect'), 1).eval()
    _sweep(ref, 'SwinIR')


def test_geometry_atd_flip_mirror():
    """ATD: flip-mirror concat padding."""
    from resselt.archs.atd.arch import ATD

    ref = init_random(ATD(embed_dim=16, depths=(2,), num_heads=(2,), window_size=8,
                          category_size=64, num_tokens=8, reducted_dim=4, convffn_kernel_size=5,
                          mlp_ratio=1.0, upscale=2, upsampler='pixelshuffledirect'), 2).eval()
    _sweep(ref, 'ATD')


def test_geometry_omni_constant_pad():
    """OmniSR: constant pad to window."""
    from resselt.archs.omni.arch import OmniSR

    ref = init_random(OmniSR(num_feat=16, block_num=1, pe=False, window_size=8,
                             res_num=1, up_scale=2, bias=True), 3).eval()
    # ESA's 7x7 maxpool needs >= ~14px inputs (reference limitation)
    _sweep(ref, 'OmniSR', tol=1e-3, sizes=[(14, 15), (24, 9), (31, 33)])


def test_geometry_cugan_fixed_halo():
    """CUGAN 2x: fixed 18px reflect halo + interior negative pads."""
    from resselt.archs.cugan.arch import UpCunet2x

    ref = init_random(UpCunet2x(), 4).eval()
    _sweep(ref, 'CuGAN', tol=1e-3, sizes=[(21, 27), (32, 32), (22, 40)])


def test_geometry_dat_internal_pad():
    """DAT: internal per-attention padding, no outer pad."""
    from resselt.archs.dat.arch import DAT

    ref = init_random(DAT(img_size=16, embed_dim=16, split_size=[2, 4], depth=[2], num_heads=[2],
                          expansion_factor=1.0, upscale=2, upsampler='pixelshuffledirect'), 5).eval()
    _sweep(ref, 'dat')


def test_geometry_figsr_halo_affine():
    """FIGSR: 4px halo + crop_extra + global affine."""
    from resselt.archs.figsr.arch import FIGSR
    import torch

    ref = init_random(FIGSR(dim=16, n_blocks=2, scale=2, gc=4, square_kernel_size=5,
                            band_kernel_size=7, expansion_ratio=2.0), 6).eval()
    for m in ref.modules():
        if hasattr(m, 'rms') and isinstance(getattr(m, 'rms', None), torch.nn.Parameter):
            with torch.no_grad():
                m.eps.copy_(torch.ones(1) * 1e-6)
                m.rms.copy_(torch.ones(1) * (m.scale.shape[0] ** -0.5))
    _sweep(ref, 'FIGSR', tol=1e-3)


def test_geometry_batch_consistency():
    """Batched inference must equal per-image inference."""
    from resselt.archs.compact.arch import SRVGGNetCompact

    ref = init_random(SRVGGNetCompact(num_feat=16, num_conv=2, upscale=2), 7).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    x = np.random.default_rng(0).random((3, 15, 17, 3), dtype=np.float32)
    batched = np.asarray(model(x))
    for i in range(3):
        single = np.asarray(model(x[i]))
        assert np.abs(batched[i] - single).max() < 1e-5
