"""Torch-parity tests for the shared functional ops."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from resselt_tpu.nn import functional as F

RTOL = 1e-5
ATOL = 1e-5


def nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize('stride,padding,dilation,groups', [
    (1, 1, 1, 1), (2, 1, 1, 1), (1, 0, 1, 1), (1, 2, 2, 1), (1, 1, 1, 4),
])
def test_conv2d(rng, stride, padding, dilation, groups):
    x = rng.standard_normal((2, 11, 13, 8), dtype=np.float32)
    w = rng.standard_normal((12, 8 // groups, 3, 3), dtype=np.float32)
    b = rng.standard_normal(12, dtype=np.float32)
    want = TF.conv2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                     stride=stride, padding=padding, dilation=dilation, groups=groups)
    got = F.conv2d(x, w, b, stride=stride, padding=padding, dilation=dilation, groups=groups)
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize('stride,padding,groups', [(2, 1, 1), (2, 0, 1), (3, 1, 2)])
def test_conv_transpose2d(rng, stride, padding, groups):
    x = rng.standard_normal((2, 7, 9, 8), dtype=np.float32)
    w = rng.standard_normal((8, 6 // groups, 4, 4), dtype=np.float32)
    b = rng.standard_normal(6, dtype=np.float32)
    want = TF.conv_transpose2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                               stride=stride, padding=padding, groups=groups)
    got = F.conv_transpose2d(x, w, b, stride=stride, padding=padding, groups=groups)
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=RTOL, atol=ATOL)


def test_linear(rng):
    x = rng.standard_normal((2, 5, 16), dtype=np.float32)
    w = rng.standard_normal((24, 16), dtype=np.float32)
    b = rng.standard_normal(24, dtype=np.float32)
    want = TF.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    got = F.linear(x, w, b)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize('r', [2, 3, 4])
def test_pixel_shuffle_roundtrip(rng, r):
    x = rng.standard_normal((2, 6, 5, 3 * r * r), dtype=np.float32)
    want = nhwc(TF.pixel_shuffle(nchw(x), r))
    got = F.pixel_shuffle(x, r)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)
    back = F.pixel_unshuffle(got, r)
    np.testing.assert_allclose(np.asarray(back), x, rtol=RTOL, atol=ATOL)
    want_un = nhwc(TF.pixel_unshuffle(nchw(want), r))
    np.testing.assert_allclose(np.asarray(back), want_un, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize('mode', ['constant', 'reflect', 'replicate', 'circular'])
def test_pad2d(rng, mode):
    x = rng.standard_normal((1, 8, 9, 3), dtype=np.float32)
    pads = (1, 2, 3, 2)
    want = nhwc(TF.pad(nchw(x), pads, mode=mode))
    got = F.pad2d(x, pads, mode=mode)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_pad2d_negative(rng):
    x = rng.standard_normal((1, 8, 9, 3), dtype=np.float32)
    pads = (-2, 1, 2, -3)
    want = nhwc(TF.pad(nchw(x), pads))
    got = F.pad2d(x, pads)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize('name,tfn', [
    ('leaky', lambda t: TF.leaky_relu(t, 0.05)),
    ('silu', TF.silu),
    ('gelu', TF.gelu),
    ('mish', TF.mish),
])
def test_activations(rng, name, tfn):
    x = rng.standard_normal((4, 64), dtype=np.float32) * 3
    want = tfn(torch.from_numpy(x)).numpy()
    fns = {'leaky': lambda a: F.leaky_relu(a, 0.05), 'silu': F.silu, 'gelu': F.gelu, 'mish': F.mish}
    got = fns[name](x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_layer_norm(rng):
    x = rng.standard_normal((2, 7, 32), dtype=np.float32)
    w = rng.standard_normal(32, dtype=np.float32)
    b = rng.standard_normal(32, dtype=np.float32)
    want = TF.layer_norm(torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    got = F.layer_norm(x, w, b)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_batch_norm(rng):
    x = rng.standard_normal((2, 5, 5, 8), dtype=np.float32)
    w, b = rng.standard_normal(8, dtype=np.float32), rng.standard_normal(8, dtype=np.float32)
    m, v = rng.standard_normal(8, dtype=np.float32), rng.random(8, dtype=np.float32) + 0.5
    want = nhwc(TF.batch_norm(nchw(x), torch.from_numpy(m), torch.from_numpy(v),
                              torch.from_numpy(w), torch.from_numpy(b), training=False))
    got = F.batch_norm_2d(x, w, b, m, v)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('sf', [2, 3])
def test_interpolate_nearest(rng, sf):
    x = rng.standard_normal((1, 5, 7, 3), dtype=np.float32)
    want = nhwc(TF.interpolate(nchw(x), scale_factor=sf, mode='nearest'))
    got = F.interpolate_nearest(x, scale_factor=sf)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_interpolate_nearest_size(rng):
    x = rng.standard_normal((1, 5, 7, 3), dtype=np.float32)
    want = nhwc(TF.interpolate(nchw(x), size=(11, 10), mode='nearest'))
    got = F.interpolate_nearest(x, size=(11, 10))
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize('align', [False, True])
@pytest.mark.parametrize('size', [(10, 14), (3, 5)])
def test_interpolate_bilinear(rng, align, size):
    x = rng.standard_normal((2, 5, 7, 3), dtype=np.float32)
    want = nhwc(TF.interpolate(nchw(x), size=size, mode='bilinear', align_corners=align))
    got = F.interpolate_bilinear(x, size=size, align_corners=align)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('align', [False, True])
@pytest.mark.parametrize('size', [(10, 14), (3, 5)])
def test_interpolate_bicubic(rng, align, size):
    x = rng.standard_normal((2, 5, 7, 3), dtype=np.float32)
    want = nhwc(TF.interpolate(nchw(x), size=size, mode='bicubic', align_corners=align))
    got = F.interpolate_bicubic(x, size=size, align_corners=align)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize('mode', ['nearest', 'bilinear', 'bicubic'])
@pytest.mark.parametrize('sf', [0.5, 1.5])
def test_interpolate_fractional_scale(rng, mode, sf):
    """Fractional scale factors must not be int-truncated (regression:
    scale_factor=0.5 produced a zero-height output)."""
    x = rng.standard_normal((1, 6, 8, 3), dtype=np.float32)
    want = nhwc(TF.interpolate(nchw(x), scale_factor=sf, mode=mode,
                               **({} if mode == 'nearest' else {'align_corners': False})))
    fn = {'nearest': F.interpolate_nearest, 'bilinear': F.interpolate_bilinear,
          'bicubic': F.interpolate_bicubic}[mode]
    got = fn(x, scale_factor=sf)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_grid_sample_unsupported_mode_raises(rng):
    x = rng.standard_normal((1, 4, 4, 2), dtype=np.float32)
    grid = np.zeros((1, 2, 2, 2), dtype=np.float32)
    with pytest.raises(NotImplementedError):
        F.grid_sample_bilinear(x, grid, padding_mode='reflection')


@pytest.mark.parametrize('align,pad_mode', [(False, 'zeros'), (True, 'zeros'), (False, 'border'), (True, 'border')])
def test_grid_sample(rng, align, pad_mode):
    x = rng.standard_normal((2, 8, 9, 4), dtype=np.float32)
    grid = (rng.random((2, 6, 7, 2), dtype=np.float32) * 2.4 - 1.2)
    want = nhwc(TF.grid_sample(nchw(x), torch.from_numpy(grid), mode='bilinear',
                               padding_mode=pad_mode, align_corners=align))
    got = F.grid_sample_bilinear(x, grid, align_corners=align, padding_mode=pad_mode)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_avg_max_pool(rng):
    x = rng.standard_normal((2, 9, 9, 4), dtype=np.float32)
    want = nhwc(TF.avg_pool2d(nchw(x), 3, stride=2, padding=1))
    got = F.avg_pool2d(x, 3, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    want = nhwc(TF.max_pool2d(nchw(x), 2, stride=2))
    got = F.max_pool2d(x, 2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_prelu(rng):
    x = rng.standard_normal((2, 5, 5, 8), dtype=np.float32)
    w = rng.standard_normal(8, dtype=np.float32)
    want = nhwc(TF.prelu(nchw(x), torch.from_numpy(w)))
    got = F.prelu(x, w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize('c,groups,k', [(96, 48, 3), (32, 16, 3), (64, 32, 5)])
def test_block_diag_group_rewrite(rng, c, groups, k):
    """The grouped->block-diag-dense rewrite (TPU dispatch) is exact: the
    expanded dense conv equals both our grouped conv and torch's."""
    x = rng.standard_normal((2, 10, 11, c), dtype=np.float32)
    w = rng.standard_normal((c, c // groups, k, k), dtype=np.float32) * 0.1
    b = rng.standard_normal(c, dtype=np.float32)
    want = nhwc(TF.conv2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                          padding=k // 2, groups=groups))
    grouped = np.asarray(F.conv2d(x, w, b, padding=k // 2, groups=groups))
    wd = np.asarray(F._block_diag_weight(jnp.asarray(w), groups))
    dense = np.asarray(F.conv2d(x, wd, b, padding=k // 2))
    np.testing.assert_allclose(grouped, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dense, want, rtol=1e-4, atol=1e-5)
    # predicate: cpg==2 rewrites, true depthwise does not
    assert F._block_diag_supported(groups, c // groups, c) == (c // groups == 2)
