"""Correctness tests for Pallas kernels (interpret mode on CPU)."""

import numpy as np
import pytest

from resselt_tpu.nn import functional as F
from resselt_tpu.ops import fused_conv3x3_act


@pytest.mark.parametrize('act', ['linear', 'lrelu', 'silu', 'mish'])
@pytest.mark.parametrize('shape', [(32, 128, 64, 64), (48, 160, 48, 64), (16, 128, 3, 64)])
def test_fused_conv3x3(act, shape):
    h, w, cin, cout = shape
    rng = np.random.default_rng(0)
    x = rng.standard_normal((h, w, cin)).astype(np.float32)
    wt = (rng.standard_normal((cout, cin, 3, 3)) * 0.05).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)

    want = F.conv2d(x[None], wt, b, padding=1)[0]
    fns = {'linear': lambda t: t, 'lrelu': lambda t: F.leaky_relu(t, 0.2), 'silu': F.silu, 'mish': F.mish}
    want = np.asarray(fns[act](want))

    got = np.asarray(fused_conv3x3_act(x, wt, b, act=act, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_conv3x3_batched():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 24, 128, 32)).astype(np.float32)
    wt = (rng.standard_normal((32, 32, 3, 3)) * 0.05).astype(np.float32)
    want = np.asarray(F.conv2d(x, wt, None, padding=1))
    got = np.asarray(fused_conv3x3_act(x, wt, None, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('act', ['linear', 'lrelu', 'mish'])
@pytest.mark.parametrize('shape', [(32, 128, 64, 64), (24, 130, 48, 32), (17, 128, 3, 64), (8, 256, 64, 16)])
def test_fused_conv3x3_pack2(act, shape):
    from resselt_tpu.ops.fused_conv import fused_conv3x3_pack2

    h, w, cin, cout = shape
    rng = np.random.default_rng(2)
    x = rng.standard_normal((h, w, cin)).astype(np.float32)
    wt = (rng.standard_normal((cout, cin, 3, 3)) * 0.05).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)

    want = F.conv2d(x[None], wt, b, padding=1)[0]
    fns = {'linear': lambda t: t, 'lrelu': lambda t: F.leaky_relu(t, 0.2), 'mish': F.mish}
    want = np.asarray(fns[act](want))

    got = np.asarray(fused_conv3x3_pack2(x, wt, b, act=act, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_conv3x3_pack2_rejects_bad_shapes():
    from resselt_tpu.ops.fused_conv import fused_conv3x3_pack2

    x = np.zeros((8, 128, 96), np.float32)
    wt = np.zeros((96, 96, 3, 3), np.float32)
    with pytest.raises(ValueError):
        fused_conv3x3_pack2(x, wt, interpret=True)
    x = np.zeros((8, 127, 32), np.float32)
    wt = np.zeros((32, 32, 3, 3), np.float32)
    with pytest.raises(ValueError):
        fused_conv3x3_pack2(x, wt, interpret=True)


@pytest.mark.parametrize('n,c,heads,masked', [
    (128, 180, 6, True),    # DAT-S spatial branch (8x16 rect windows)
    (256, 144, 6, False),   # HAT-S window attention (ws=16)
    (256, 48, 4, True),     # ATD-light window branch
])
def test_window_mha_pallas(n, c, heads, masked):
    import jax.numpy as jnp

    from resselt_tpu.nn.window import multi_head_attention
    from resselt_tpu.ops.window_attention import window_mha_pallas

    rng = np.random.default_rng(0)
    nw, b = 4, 2
    q, k, v = (jnp.asarray(rng.standard_normal((b * nw, n, c), np.float32)) for _ in range(3))
    hd = c // heads
    bias = jnp.asarray(rng.standard_normal((heads, n, n), np.float32) * 0.1)
    mask = None
    if masked:
        mask = jnp.asarray(np.where(rng.random((nw, n, n)) < 0.2, -100.0, 0.0).astype(np.float32))
    scale = hd**-0.5
    want = np.asarray(multi_head_attention(q, k, v, heads, scale, bias=bias, mask=mask))
    got = np.asarray(window_mha_pallas(q, k, v, bias, mask, num_heads=heads, scale=scale,
                                       interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('h,w,cin,cout,k', [
    (40, 256, 16, 16, 17),  # PLKSR-S partial conv shape class
    (32, 128, 32, 32, 13),
    (24, 128, 16, 8, 5),
    (19, 200, 16, 16, 17),  # unaligned h/w
])
def test_fused_conv_lk(h, w, cin, cout, k):
    from resselt_tpu.ops.fused_conv import fused_conv_lk

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, h, w, cin)).astype(np.float32)
    wt = (rng.standard_normal((cout, cin, k, k)) * 0.05).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    want = np.asarray(F.conv2d(x, wt, b, padding=k // 2))
    got = np.asarray(fused_conv_lk(x, wt, b, k=k, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_conv_lk_rejects_bad_shapes():
    from resselt_tpu.ops.fused_conv import fused_conv_lk

    x = np.zeros((2, 32, 128, 24), np.float32)  # 24 does not divide 128
    wt = np.zeros((24, 24, 17, 17), np.float32)
    with pytest.raises(ValueError):
        fused_conv_lk(x, wt, k=17, interpret=True)


@pytest.mark.parametrize('n,c,heads,head_pad', [
    (256, 144, 6, 32),   # HAT-S shapes, heads padded to aligned lanes
    (256, 48, 4, 16),    # ATD-light shapes
    (128, 180, 6, 32),
])
def test_window_mha_pallas_head_pad(n, c, heads, head_pad):
    import jax.numpy as jnp

    from resselt_tpu.nn.window import multi_head_attention
    from resselt_tpu.ops.window_attention import window_mha_pallas

    rng = np.random.default_rng(1)
    nw, b = 4, 2
    q, k, v = (jnp.asarray(rng.standard_normal((b * nw, n, c), np.float32)) for _ in range(3))
    hd = c // heads
    bias = jnp.asarray(rng.standard_normal((heads, n, n), np.float32) * 0.1)
    mask = jnp.asarray(np.where(rng.random((nw, n, n)) < 0.2, -100.0, 0.0).astype(np.float32))
    scale = hd**-0.5
    want = np.asarray(multi_head_attention(q, k, v, heads, scale, bias=bias, mask=mask))
    got = np.asarray(window_mha_pallas(q, k, v, bias, mask, num_heads=heads, scale=scale,
                                       interpret=True, head_pad=head_pad))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('n,c,heads,hd_pad,with_mask', [
    (256, 144, 6, 32, True),   # HAT-S shapes
    (256, 48, 4, 16, False),   # ATD-light shapes
])
def test_packed_qkv_attention(n, c, heads, hd_pad, with_mask):
    """Weight-folded head padding must be exactly equivalent to the plain
    qkv -> MHA -> proj path (padded lanes are zeros through every matmul)."""
    import jax.numpy as jnp

    from resselt_tpu.nn import functional as F
    from resselt_tpu.nn.params import PTree
    from resselt_tpu.nn.window import multi_head_attention, packed_qkv_attention

    rng = np.random.default_rng(2)
    nw, b = 4, 2
    x = jnp.asarray(rng.standard_normal((b * nw, n, c), np.float32))
    params = {
        'qkv.weight': jnp.asarray(rng.standard_normal((3 * c, c), np.float32) * 0.05),
        'qkv.bias': jnp.asarray(rng.standard_normal((3 * c,), np.float32) * 0.05),
        'proj.weight': jnp.asarray(rng.standard_normal((c, c), np.float32) * 0.05),
        'proj.bias': jnp.asarray(rng.standard_normal((c,), np.float32) * 0.05),
    }
    p = PTree(params)
    bias = jnp.asarray(rng.standard_normal((heads, n, n), np.float32) * 0.1)
    mask = None
    if with_mask:
        mask = jnp.asarray(np.where(rng.random((nw, n, n)) < 0.2, -100.0, 0.0).astype(np.float32))

    hd = c // heads
    qkv = F.linear(x, params['qkv.weight'], params['qkv.bias'])
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    ref = multi_head_attention(q, k, v, heads, hd**-0.5, bias=bias, mask=mask)
    ref = F.linear(ref, params['proj.weight'], params['proj.bias'])

    got = packed_qkv_attention(p, x, bias, mask, heads, hd_pad=hd_pad, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_conv_lk_bf16_compute():
    """Opt-in bf16 compute path (compute_dtype='bfloat16') stays within
    bf16 rounding of the XLA bf16 conv; default path ignores it for bf16
    inputs (f32 slab) and stays exact."""
    import jax.numpy as jnp

    from resselt_tpu.ops.fused_conv import fused_conv_lk

    rng = np.random.default_rng(3)
    x = np.asarray(rng.standard_normal((2, 24, 144, 16)) * 0.3, np.float32)
    wt = np.asarray(rng.standard_normal((16, 16, 17, 17)) * 0.05, np.float32)
    b = np.asarray(rng.standard_normal(16), np.float32)
    want = np.asarray(F.conv2d(jnp.asarray(x, jnp.bfloat16), wt, b, padding=8), dtype=np.float32)
    got = np.asarray(
        fused_conv_lk(jnp.asarray(x, jnp.bfloat16), wt, b, k=17, interpret=True,
                      compute_dtype='bfloat16'), dtype=np.float32)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02, rel


@pytest.mark.parametrize('shape,th', [((2, 37, 45, 64), 16), ((1, 16, 128, 64), 8)])
def test_fused_molrcm(shape, th):
    """Fused MOLRCM kernel (interpret) matches the jnp reference chain to
    f32 rounding.  Both paths sit ~3.4e-4 from a float64 oracle on this
    random construction (weights 0.1: the gelu/silu multiplicative chain
    amplifies rounding), so the cross-tolerance is 1e-3, not 1e-5."""
    import jax.numpy as jnp

    from resselt_tpu.archs.eimn import _molrcm
    from resselt_tpu.nn.params import PTree
    from resselt_tpu.ops.molrcm import fused_molrcm, molrcm_supported

    d = shape[-1]
    assert molrcm_supported(d, shape[1], shape[2])
    rng = np.random.default_rng(0)
    params = {}

    def conv(name, o, i, k):
        params[f'{name}.weight'] = jnp.asarray(rng.standard_normal((o, i, k, k), np.float32) * 0.1)
        params[f'{name}.bias'] = jnp.asarray(rng.standard_normal((o,), np.float32) * 0.1)

    c1, c2 = int(3 / 8 * d), int(1 / 8 * d)
    conv('proj_value.0', d, d, 1)
    conv('proj_query.0', d, d, 1)
    conv('region', d, 1, 5)
    conv('spatial_1', c1, 1, 5)
    conv('spatial_2', d - c1 - c2, 1, 7)
    conv('fusion', d, d, 1)
    conv('out', d, d, 1)
    p = PTree(params)
    x = jnp.asarray(rng.standard_normal(shape, np.float32) * 0.3)

    want = np.asarray(_molrcm(p, x, d))
    got = np.asarray(fused_molrcm(p, x, d, th=th, interpret=True))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1.5e-3 * scale)


def test_fused_conv_rejects_unaligned_th():
    """th not a multiple of 8 makes the HBM DMA start at a non-8-aligned
    sublane row — the documented TPU-worker hard-crash class; the entry
    points must refuse it up front (on every backend)."""
    import numpy as np
    import pytest

    from resselt_tpu.ops.fused_conv import fused_conv3x3_act, fused_conv3x3_pack2, fused_conv_lk

    x = np.zeros((1, 16, 16, 16), np.float32)
    w = np.zeros((16, 16, 3, 3), np.float32)
    for fn in (fused_conv3x3_act, fused_conv3x3_pack2):
        with pytest.raises(ValueError, match='multiple of 8'):
            fn(x, w, th=12, interpret=True)
    with pytest.raises(ValueError, match='multiple of 8'):
        fused_conv_lk(x, np.zeros((16, 16, 17, 17), np.float32), k=17, th=12, interpret=True)
    with pytest.raises(ValueError, match='linear'):
        fused_conv_lk(x, np.zeros((16, 16, 17, 17), np.float32), k=17, act='silu', interpret=True)


@pytest.mark.parametrize('b,nw,n,c,heads', [
    (256, 64, 64, 60, 6),    # cs=64 divides b, nw | cs (whole mask periods)
    (288, 144, 64, 60, 6),   # cs=72 divides nw (mask sliced per chunk)
    (256, None, 256, 144, 6),  # no mask, HAT-class
])
def test_chunked_attention_matches_unchunked(b, nw, n, c, heads):
    """The >=128-window chunked XLA dispatch (nn/window.py::_attn_chunk_size)
    is exact: identical per-row math, concatenated."""
    import jax.numpy as jnp

    from resselt_tpu.nn import window as W

    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, c), np.float32) * 0.2) for _ in range(3))
    bias = jnp.asarray(rng.standard_normal((heads, n, n), np.float32) * 0.1)
    mask = None
    if nw is not None:
        mask = jnp.asarray(np.where(rng.random((nw, n, n)) < 0.2, -100.0, 0.0).astype(np.float32))
    scale = (c // heads) ** -0.5

    cs = W._attn_chunk_size(b, nw)
    assert cs is not None and cs < b, (cs, b, nw)
    if nw is not None:
        assert cs % nw == 0 or nw % cs == 0

    try:
        W.use_chunked_attention(True)
        got = np.asarray(W.multi_head_attention(q, k, v, heads, scale, bias=bias, mask=mask))
        W.use_chunked_attention(False)
        want = np.asarray(W.multi_head_attention(q, k, v, heads, scale, bias=bias, mask=mask))
    finally:
        W.use_chunked_attention(True)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_attn_chunk_size_rules():
    from resselt_tpu.nn.window import _attn_chunk_size

    assert _attn_chunk_size(64, None) is None          # below threshold
    assert _attn_chunk_size(512, None) == 64
    assert _attn_chunk_size(512, 64) == 64             # whole mask periods
    assert _attn_chunk_size(1152, 144) == 72           # divisor of the mask period
    cs = _attn_chunk_size(200, 100)                    # DRCT-L 160px b2
    assert cs in (40, 50, 100) and (cs % 100 == 0 or 100 % cs == 0)
    assert _attn_chunk_size(127, None) is None         # prime, no divisor in range
