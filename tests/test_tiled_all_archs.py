"""Integration sweep: every architecture family through the tiled driver.

Exercises the interaction of overlap tiling with every pad/crop geometry in
the zoo (window multiples, unshuffle factors, U-net depths, fixed halos).
Conv families with receptive field <= halo must match the whole-image run
almost exactly; global/attention families are bounded approximations."""

import numpy as np
import pytest
import torch

import resselt_tpu
from resselt_tpu.parallel import upscale_tiled
from tests.test_detection_matrix import _tiny_models
from tests.torch_ref import init_random, state_dict_to_numpy

# families whose receptive field is global-ish (attention, U-nets, FFT):
# tiled output is an approximation, judged at a looser threshold
_GLOBAL = {
    'SwinIR', 'HAT', 'DRCT', 'dat', 'RGT', 'ATD', 'OmniSR', 'FlexNet',
    'GateR', 'GateRv2', 'GateRV3', 'GFISR', 'GFISRV2', 'FIGSR', 'LAWFFT',
    'FDAT', 'RHA', 'eimn', 'MoSRv2', 'SMoSR', 'MoESR', 'RTMoSR', 'CuGAN',
}
# archs needing a larger tile window (e.g. FlexNet meta pipeline >= 64px)
_BIG_WINDOW = {'FlexNet', 'RHA', 'CuGAN', 'GateR', 'GateRv2', 'GateRV3'}


def _fix_figsr(ref):
    for m in ref.modules():
        if hasattr(m, 'rms') and hasattr(m, 'eps'):
            with torch.no_grad():
                m.eps.copy_(torch.ones(1) * 1e-6)
                m.rms.copy_(torch.ones(1) * (m.scale.shape[0] ** -0.5))
    return ref


@pytest.mark.parametrize('name', sorted(_tiny_models().keys()))
def test_tiled_matches_whole(name):
    expect = name.split('-')[0]
    ref = init_random(_tiny_models()[name], seed=hash(name) % 2**31).eval()
    if expect == 'FIGSR':
        _fix_figsr(ref)
    model = resselt_tpu.load_from_state_dict(state_dict_to_numpy(ref.state_dict()))

    if not isinstance(model.metadata.upscale, int):
        img = np.random.default_rng(0).random((72, 88, 3), dtype=np.float32)
        with pytest.raises(ValueError):
            upscale_tiled(model, img, tile=24, halo=12)
        return

    if expect in _BIG_WINDOW:
        tile, halo, hw = 40, 16, (96, 112)
    else:
        tile, halo, hw = 24, 12, (72, 88)
    img = np.random.default_rng(0).random((*hw, 3), dtype=np.float32)

    whole = np.asarray(model(img))
    tiled = np.asarray(upscale_tiled(model, img, tile=tile, halo=halo))
    assert tiled.shape == whole.shape, name

    mse = np.mean((whole.astype(np.float64) - tiled.astype(np.float64)) ** 2)
    peak = float(max(np.abs(whole).max(), 1.0))
    psnr = 10 * np.log10(peak * peak / max(mse, 1e-14))
    floor = 30.0 if expect in _GLOBAL else 55.0
    assert psnr > floor, f'{name}: tiled vs whole only {psnr:.1f} dB (floor {floor})'
