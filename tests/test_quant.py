"""int8 quantized serving (resselt_tpu.quant): math + model-level sanity."""

import numpy as np
import pytest

import jax.numpy as jnp

import resselt_tpu
from resselt_tpu import quant
from resselt_tpu.nn import functional as F
from resselt_tpu import zoo


def test_conv2d_int8_matches_manual_quant_math():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 10, 40)).astype(np.float32)
    w = (rng.standard_normal((48, 40, 3, 3)) * 0.1).astype(np.float32)
    b = rng.standard_normal(48).astype(np.float32)
    q, s = quant.quantize_weight(w)

    got = np.asarray(F.conv2d_int8(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s),
                                   jnp.asarray(b), padding=1))
    # manual reference of the same quantization scheme in f64 numpy
    s_a = max(np.abs(x).max(), 1e-12) / 127.0
    xq = np.clip(np.round(x / s_a), -127, 127)
    acc = np.asarray(F.conv2d(jnp.asarray(xq.astype(np.float32)),
                              jnp.asarray(q.astype(np.float32)), padding=1))
    want = acc * (s[None, None, None, :] * s_a) + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # and it approximates the fp conv (random weights: a loose bound)
    fp = np.asarray(F.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), padding=1))
    rel = np.abs(got - fp).max() / np.abs(fp).max()
    assert rel < 0.05


def test_eligibility_bounds():
    assert quant.eligible('a.weight', np.zeros((64, 64, 3, 3), np.float32))
    assert not quant.eligible('a.weight', np.zeros((64, 1, 3, 3), np.float32))  # depthwise
    assert not quant.eligible('a.weight', np.zeros((64, 2, 3, 3), np.float32))  # 2ch group
    assert not quant.eligible('a.weight', np.zeros((64, 3, 3, 3), np.float32))  # head conv
    assert not quant.eligible('a.weight', np.zeros((3, 64, 3, 3), np.float32))  # tail conv
    assert not quant.eligible('a.bias', np.zeros((64, 64, 3, 3), np.float32))
    assert not quant.eligible('a.weight', np.zeros((64, 64), np.float32))  # linear


@pytest.mark.parametrize('family', ['compact', 'esrgan', 'span'])
def test_quantized_model_forward(family):
    """Quantized conv-family models run and stay close to fp on CPU."""
    sd = getattr(zoo, f'make_{family}')(**({'num_blocks': 3} if family == 'esrgan' else {}))
    model = resselt_tpu.load_from_state_dict(sd)
    qm = model.quantize_int8()
    n8 = sum(1 for v in qm.params.values() if str(v.dtype) == 'int8')
    assert n8 > 0

    x = np.random.default_rng(1).random((1, 20, 22, 3), dtype=np.float32)
    fp = np.asarray(model(x))
    q = np.asarray(qm(x))
    assert q.shape == fp.shape
    # PTQ on random-weight nets: expect small but nonzero error
    rel = np.abs(q - fp).max() / max(np.abs(fp).max(), 1e-6)
    assert rel < 0.2, rel
    assert not np.allclose(q, fp)  # it really took the int8 path


def test_quantize_rejects_ineligible_model():
    sd = zoo.make_gater()  # depthwise/grouped U-net: little eligible
    model = resselt_tpu.load_from_state_dict(sd)
    try:
        qm = model.quantize_int8()
    except ValueError:
        return  # acceptable: nothing eligible
    # if something was eligible, the forward must still run
    x = np.random.default_rng(2).random((1, 24, 24, 3), dtype=np.float32)
    np.asarray(qm(x))
