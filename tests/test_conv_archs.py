"""Parity tests for the conv SR families vs the torch reference oracle."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 5e-4


def _roundtrip(ref, x, expect_id, expect_upscale=None):
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == expect_id
    if expect_upscale is not None:
        assert model.metadata.upscale == expect_upscale
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    err = max_err(got, want)
    assert err < TOL, f'{expect_id}: max err {err}'
    return model


@pytest.mark.parametrize('upscale', [1, 2, 4])
def test_compact(upscale):
    from resselt.archs.compact.arch import SRVGGNetCompact

    ref = init_random(SRVGGNetCompact(num_feat=24, num_conv=4, upscale=upscale), 1).eval()
    x = np.random.default_rng(0).random((1, 17, 23, 3), dtype=np.float32)
    _roundtrip(ref, x, 'Compact', upscale)


@pytest.mark.parametrize('norm', [True, False])
def test_span(norm):
    from resselt.archs.span.arch import SPAN

    ref = init_random(
        SPAN(num_in_ch=3, num_out_ch=3, feature_channels=16, upscale=2, norm=norm), 2
    ).eval()
    x = np.random.default_rng(0).random((1, 16, 18, 3), dtype=np.float32)
    model = _roundtrip(ref, x, 'SPAN', 2)
    assert model.config.norm is norm


@pytest.mark.parametrize('scale,plus', [(1, False), (2, False), (4, False), (4, True), (8, False)])
def test_esrgan_old_arch(scale, plus):
    from resselt.archs.esrgan.arch import RRDBNet

    ref = init_random(RRDBNet(num_filters=16, num_blocks=2, scale=scale, plus=plus), 3).eval()
    x = np.random.default_rng(0).random((1, 12, 14, 3), dtype=np.float32)
    model = _roundtrip(ref, x, 'ESRGAN', scale)
    assert model.config.plus is plus


def test_esrgan_realesrgan_shuffle():
    """Real-ESRGAN x2: in_nc = out_nc*4, input pixel-unshuffled."""
    from resselt.archs.esrgan.arch import RRDBNet

    ref = init_random(
        RRDBNet(in_nc=12, out_nc=3, num_filters=16, num_blocks=2, scale=4, shuffle_factor=2), 4
    ).eval()
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'ESRGAN'
    assert model.config.shuffle_factor == 2
    assert model.metadata.upscale == 2
    # odd input exercises the pad/crop path
    x = np.random.default_rng(0).random((1, 13, 15, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    assert max_err(got, want) < TOL


def test_esrgan_new_arch_keys():
    """new-arch (Real-ESRGAN style) key names must be detected and remapped."""
    from resselt.archs.esrgan.arch import RRDBNet

    ref = init_random(RRDBNet(num_filters=16, num_blocks=2, scale=4), 5).eval()
    old_sd = state_dict_to_numpy(ref.state_dict())
    new_sd = {}
    for k, v in old_sd.items():
        nk = k
        nk = nk.replace('model.0.', 'conv_first.')
        nk = nk.replace('model.1.sub.2.', 'trunk_conv.')
        m = __import__('re').match(r'model\.1\.sub\.(\d+)\.RDB(\d)\.conv(\d+)\.0\.(weight|bias)', nk)
        if m:
            nk = f'RRDB_trunk.{m.group(1)}.RDB{m.group(2)}.conv{m.group(3)}.{m.group(4)}'
        nk = nk.replace('model.3.', 'upconv1.').replace('model.6.', 'upconv2.')
        nk = nk.replace('model.8.', 'HRconv.').replace('model.10.', 'conv_last.')
        new_sd[nk] = v
    assert 'conv_first.weight' in new_sd and 'RRDB_trunk.0.RDB1.conv1.weight' in new_sd

    model = resselt_tpu.load_from_state_dict(new_sd)
    assert model.arch_id == 'ESRGAN'
    x = np.random.default_rng(0).random((1, 8, 9, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert max_err(got, want) < TOL


@pytest.mark.parametrize('lk_type,ccm', [('PLK', 'CCM'), ('PLK', 'DCCM'), ('PLK', 'ICCM'),
                                         ('SparsePLK', 'DCCM'), ('RectSparsePLK', 'DCCM')])
def test_plksr(lk_type, ccm):
    from resselt.archs.plksr.plksr import plksr

    ref = init_random(
        plksr(dim=16, n_blocks=2, upscaling_factor=2, ccm_type=ccm,
              kernel_size=9, split_ratio=0.25, lk_type=lk_type, use_ea=True), 6
    ).eval()
    x = np.random.default_rng(0).random((1, 14, 13, 3), dtype=np.float32)
    _roundtrip(ref, x, 'PLKSR', 2)


@pytest.mark.parametrize('dys,use_ea,scale', [(False, True, 4), (True, True, 2), (False, False, 2), (True, False, 3)])
def test_realplksr(dys, use_ea, scale):
    from resselt.archs.plksr.rplksr import realplksr

    ref = init_random(
        realplksr(dim=16, n_blocks=2, upscaling_factor=scale, kernel_size=9,
                  split_ratio=0.25, use_ea=use_ea, norm_groups=4, dysample=dys), 7
    ).eval()
    x = np.random.default_rng(0).random((1, 12, 10, 3), dtype=np.float32)
    model = _roundtrip(ref, x, 'PLKSR', scale)
    assert model.metadata.name == 'RealPLKSR'
    assert model.config.dys is dys


@pytest.mark.parametrize('upsampler,scale', [('ps', 2), ('dys', 2), ('gps', 4)])
def test_mosr(upsampler, scale):
    from resselt.archs.mosr.arch import mosr

    ref = init_random(
        mosr(n_block=2, dim=16, upscale=scale, upsampler=upsampler,
             expansion_ratio=1.5, conv_ratio=1.0, kernel_size=7), 8
    ).eval()
    x = np.random.default_rng(0).random((1, 11, 13, 3), dtype=np.float32)
    model = _roundtrip(ref, x, 'MoSR', scale)
    assert model.config.upsampler == upsampler
