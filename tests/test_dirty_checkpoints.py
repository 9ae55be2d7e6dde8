"""Dirty-checkpoint ingestion matrix: every family through load_from_file
with realistic real-world dirt.

Released checkpoints are rarely clean exports: they carry trainer wrappers
('state_dict', 'params_ema', 'params'), DataParallel prefixes ('module.',
'netG.'), half-precision storages, the legacy (non-zip) torch pickle
format, and profiler junk keys (thop's total_ops/total_params — the
reference strips these for omni, resselt/archs/omni/__init__.py:26-29;
wrapper/prefix handling is resselt/utilities/state_dict.py:16-36).

For each of the 31 families this writes actual files via torch.save and
loads them through OUR pure-python reader + canonicalize + detection,
asserting the detected id and bit-equality of the loaded params against an
in-memory load of the same (identically quantized) state dict.
"""

import numpy as np
import pytest
import torch

import resselt_tpu
from tests.test_detection_matrix import _tiny_models
from tests.torch_ref import state_dict_to_numpy


def _families():
    torch.manual_seed(0)
    return {name: state_dict_to_numpy(m.eval().state_dict()) for name, m in _tiny_models().items()}


@pytest.fixture(scope='module')
def family_sds():
    return _families()


def _to_torch(sd_np, half: bool):
    out = {}
    for k, v in sd_np.items():
        t = torch.from_numpy(np.asarray(v))
        if half and t.dtype == torch.float32:
            t = t.half()
        out[k] = t
    return out


def _assert_params_equal(model, expect_model, name):
    assert model.arch_id == expect_model.arch_id, name
    assert set(model.params) == set(expect_model.params), name
    for k in model.params:
        a, b = np.asarray(model.params[k]), np.asarray(expect_model.params[k])
        assert a.shape == b.shape, (name, k)
        np.testing.assert_array_equal(a, b, err_msg=f'{name}:{k}')


@pytest.mark.parametrize('name', sorted(_families()))
def test_dirty_checkpoint_roundtrip(name, family_sds, tmp_path):
    expect_id = name.split('-')[0]
    sd_np = family_sds[name]

    # variant A: zip .pth, {'state_dict': ...} wrapper, 'module.' prefix,
    # fp16 storages
    wrapped = {'state_dict': {f'module.{k}': v for k, v in _to_torch(sd_np, half=True).items()}}
    path_a = tmp_path / 'dirty_a.pth'
    torch.save(wrapped, path_a)
    model_a = resselt_tpu.load_from_file(str(path_a))
    assert model_a.arch_id == expect_id, name

    # oracle: in-memory load of the identically fp16-quantized dict
    sd_half = {k: np.asarray(v, dtype=np.float16) if np.asarray(v).dtype == np.float32 else v
               for k, v in sd_np.items()}
    expect_a = resselt_tpu.load_from_state_dict(sd_half)
    _assert_params_equal(model_a, expect_a, name)

    # variant B: legacy (non-zip) pickle, {'params': ...} wrapper,
    # 'netG.' prefix, f32
    wrapped = {'params': {f'netG.{k}': v for k, v in _to_torch(sd_np, half=False).items()}}
    path_b = tmp_path / 'dirty_b.pth'
    torch.save(wrapped, path_b, _use_new_zipfile_serialization=False)
    model_b = resselt_tpu.load_from_file(str(path_b))
    expect_b = resselt_tpu.load_from_state_dict(sd_np)
    _assert_params_equal(model_b, expect_b, name)


def test_omni_thop_junk_keys(family_sds, tmp_path):
    """thop-profiled omni checkpoints carry total_ops/total_params keys at
    every module level (reference strips them: omni/__init__.py:26-29)."""
    sd_np = dict(family_sds['OmniSR'])
    junk = {}
    junk['total_ops'] = np.zeros((1,), np.float64)
    junk['total_params'] = np.zeros((1,), np.float64)
    for k in list(sd_np):
        head = k.rsplit('.', 1)[0]
        junk[f'{head}.total_ops'] = np.zeros((1,), np.float64)
        junk[f'{head}.total_params'] = np.zeros((1,), np.float64)
    dirty = {**sd_np, **junk}
    path = tmp_path / 'omni_thop.pth'
    torch.save(_to_torch(dirty, half=False), path)
    model = resselt_tpu.load_from_file(str(path))
    expect = resselt_tpu.load_from_state_dict(sd_np)
    _assert_params_equal(model, expect, 'OmniSR')


def test_ema_wrapper_and_safetensors(family_sds, tmp_path):
    """params_ema wrapper (ESRGAN-style trainers) and a safetensors export."""
    sd_np = family_sds['ESRGAN']
    path = tmp_path / 'ema.pth'
    torch.save({'params_ema': _to_torch(sd_np, half=False)}, path)
    model = resselt_tpu.load_from_file(str(path))
    expect = resselt_tpu.load_from_state_dict(sd_np)
    _assert_params_equal(model, expect, 'ESRGAN-ema')

    st = pytest.importorskip('safetensors.torch')
    path2 = tmp_path / 'clean.safetensors'
    st.save_file({k: v.contiguous() for k, v in _to_torch(sd_np, half=False).items()}, str(path2))
    model2 = resselt_tpu.load_from_file(str(path2))
    _assert_params_equal(model2, expect, 'ESRGAN-safetensors')
