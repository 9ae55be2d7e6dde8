"""Parity tests for SMoSR vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 1e-3


@pytest.mark.parametrize('rep,upsampler,scale', [
    (False, 'pixelshuffledirect', 2),
    (True, 'pixelshuffledirect', 2),
    (False, 'pa_up', 4),
    (False, 'dysample', 2),
])
def test_smosr(rep, upsampler, scale):
    from resselt.archs.smosr.arch import SMoSR

    ref = init_random(
        SMoSR(in_ch=3, out_ch=3, dim=16, scale=scale, rep=rep, n_mb=2,
              upsampler=upsampler, upsampler_mid_dim=8, d_kernel=3), 131
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'SMoSR'
    assert model.metadata.upscale == scale
    assert model.config.rep is rep
    x = np.random.default_rng(3).random((1, 14, 18, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'smosr rep={rep} {upsampler}: max err {err}'


def test_smosr_dysample_no_leading_conv():
    """mid_dim == in_dim puts DySample at 'upsampler.0' (no leading conv);
    d_kernel must be read from 'upsampler.0.end_conv.weight' (regression:
    silent d_kernel=1 fallback mis-cropped the output)."""
    from resselt.archs.smosr.arch import SMoSR

    ref = init_random(
        SMoSR(in_ch=3, out_ch=3, dim=16, scale=2, rep=False, n_mb=2,
              upsampler='dysample', upsampler_mid_dim=16 + 3 * 4, d_kernel=3), 131
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    assert 'upsampler.0.end_conv.weight' in sd and 'upsampler.2.end_conv.weight' not in sd
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.config.d_kernel == 3
    x = np.random.default_rng(4).random((1, 12, 14, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape == (1, 24, 28, 3)
    assert max_err(got, want) < TOL


def test_smosr_rep_drops_stale_nested_eval_convs():
    """rep=True checkpoints carry the torch modules' nested eval_conv
    buffers inside consumed ConvNXC/DOConv bundles; transform_params must
    keep only the collapsed outputs (regression: 82% of uploaded param
    elements were stale)."""
    from resselt.archs.smosr.arch import SMoSR

    ref = init_random(
        SMoSR(in_ch=3, out_ch=3, dim=16, scale=2, rep=True, n_mb=2,
              upsampler='pixelshuffledirect', upsampler_mid_dim=8, d_kernel=3), 131
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    stale = [k for k in model.params
             if '.eval_conv.' in k and not k.endswith(('eval_conv.weight', 'eval_conv.bias'))]
    nested = [k for k in model.params if k.count('.eval_conv.') > 1 or
              ('.sk.eval_conv.' in k or '.conv.0.eval_conv.' in k or
               '.conv.1.eval_conv.' in k or '.conv.2.eval_conv.' in k)]
    assert not stale and not nested, (stale[:3], nested[:3])
