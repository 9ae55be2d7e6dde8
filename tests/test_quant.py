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


def _quantize_and_check(model, size=(1, 24, 28, 3), rel_bound=0.2):
    """quantize_int8 contract: either ValueError (nothing eligible) or a
    model whose forward runs and stays close to fp — never a crash, never
    silent garbage."""
    try:
        qm = model.quantize_int8()
    except ValueError:
        return None
    x = np.random.default_rng(3).random(size, dtype=np.float32)
    fp = np.asarray(model(x))
    q = np.asarray(qm(x))
    assert q.shape == fp.shape
    rel = np.abs(q - fp).max() / max(np.abs(fp).max(), 1e-6)
    assert rel < rel_bound, rel
    return qm


def test_quantize_discovery_excludes_transposed_convs():
    """CUGAN's UNets consume eligible-SHAPED weights via F.conv_transpose2d,
    which has no int8 path; consumption discovery must leave them float
    (previously: silently consumed int8 codes as values -> garbage)."""
    from tests.torch_ref import init_random, state_dict_to_numpy
    from resselt.archs.cugan.arch import UpCunet2x

    sd = state_dict_to_numpy(init_random(UpCunet2x(), 7).eval().state_dict())
    model = resselt_tpu.load_from_state_dict(sd)
    qm = _quantize_and_check(model, size=(1, 21, 27, 3))
    assert qm is not None  # interior plain convs ARE eligible
    for k, v in qm.params.items():
        if str(v.dtype) == 'int8':
            assert '.conv_bottom.' not in k and 'up' not in k.split('.')[-2], k


def test_quantize_discovery_excludes_raw_conv2d_consumers():
    """Omni consumes qkv weights via raw F.conv2d (no int8 dispatch);
    discovery must exclude them (previously: TypeError at forward)."""
    from tests.torch_ref import init_random, state_dict_to_numpy
    from resselt.archs.omni.arch import OmniSR

    ref = init_random(OmniSR(num_feat=64, block_num=1, pe=True, window_size=8,
                             res_num=1, up_scale=4), 9).eval()
    model = resselt_tpu.load_from_state_dict(state_dict_to_numpy(ref.state_dict()))
    _quantize_and_check(model, size=(1, 24, 24, 3))


def test_quantized_mixed_rdb_dequantizes_gracefully():
    """gc=16 ESRGAN: only conv5 of each RDB is shape-eligible; the producer
    decomposition needs uniform dtype, so the int8 member is dequantized at
    trace time instead of crashing (exact-math fallback)."""
    sd = zoo.make_esrgan(num_blocks=2, gc=16)
    model = resselt_tpu.load_from_state_dict(sd)
    qm = _quantize_and_check(model, size=(1, 20, 22, 3))
    assert qm is not None
    assert any(str(v.dtype) == 'int8' and k.endswith('conv5.0.weight')
               for k, v in qm.params.items())


def test_conv_transpose2d_rejects_int8_weight():
    w8 = jnp.zeros((64, 64, 2, 2), jnp.int8)
    x = jnp.zeros((1, 8, 8, 64), jnp.float32)
    with pytest.raises(TypeError):
        F.conv_transpose2d(x, w8, stride=2)


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
