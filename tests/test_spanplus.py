"""End-to-end parity: reference SpanPlus (torch) vs resselt_tpu (JAX)."""

import numpy as np
import pytest

import resselt_tpu
from tests.torch_ref import init_random, max_err, run_torch, state_dict_to_numpy

TOL = 2e-4


def _make_ref(upsampler: str, upscale: int, blocks=(2,), feat=16):
    from resselt.archs.spanplus.arch import SpanPlus

    m = SpanPlus(
        num_in_ch=3, num_out_ch=3, blocks=list(blocks),
        feature_channels=feat, upscale=upscale, upsampler=upsampler,
    )
    return init_random(m, seed=42).eval()


@pytest.mark.parametrize('upsampler,upscale', [('ps', 2), ('ps', 4), ('dys', 2), ('conv', 1)])
def test_spanplus_parity(upsampler, upscale):
    ref = _make_ref(upsampler, upscale)
    sd = state_dict_to_numpy(ref.state_dict())

    model = resselt_tpu.load_from_state_dict(sd)
    assert model.arch_id == 'spanplus'
    assert model.metadata.upscale == upscale
    assert model.metadata.name == 'SPANPlus'

    rng = np.random.default_rng(7)
    x = rng.random((1, 24, 20, 3), dtype=np.float32)
    want = run_torch(ref, x)
    got = np.asarray(model(x))
    assert got.shape == want.shape
    assert max_err(got, want) < TOL


def test_spanplus_multiblock_parity():
    ref = _make_ref('ps', 2, blocks=(2, 3), feat=16)
    sd = state_dict_to_numpy(ref.state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    assert model.config.blocks == (2, 3)
    x = np.random.default_rng(1).random((2, 16, 16, 3), dtype=np.float32)
    assert max_err(np.asarray(model(x)), run_torch(ref, x)) < TOL
