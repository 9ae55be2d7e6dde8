"""Functional NN ops with exact PyTorch numerical semantics, NHWC layout.

Conventions:
* activations/feature maps are NHWC ``(N, H, W, C)``;
* conv weights keep the torch OIHW layout, linear weights keep ``(out, in)``
  — orientation is handled here via ``dimension_numbers``/``dot_general`` so
  loaded checkpoints need no per-arch transposition;
* all ops match torch defaults bit-for-bit in f32 where possible (e.g.
  nearest interpolation uses torch's asymmetric index rule, bicubic uses
  A=-0.75).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def _scale_pair(v) -> tuple[float, float]:
    """scale_factor pair WITHOUT int truncation (0.5 must stay 0.5);
    torch's output size is floor(in * scale)."""
    if isinstance(v, (tuple, list)):
        return (float(v[0]), float(v[1]))
    return (float(v), float(v))


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

_BLOCK_DIAG_GROUPS = True


def use_block_diag_groups(on: bool) -> None:
    """Kill switch for the grouped-conv -> block-diagonal dense rewrite
    (mirrors ops.fused_conv.use_fused_lk; keyed into jit caches via
    core.factory._dispatch_flags)."""
    global _BLOCK_DIAG_GROUPS
    _BLOCK_DIAG_GROUPS = bool(on)


def block_diag_groups_enabled() -> bool:
    return _BLOCK_DIAG_GROUPS


def _block_diag_supported(groups: int, cpg: int, cin: int) -> bool:
    """Shapes where the dense rewrite measured faster (tools/probe_group_conv.py):
    2-channels-per-group convs lose 4.4-18x under XLA's TPU grouped path
    (0.06 TFLOP/s at 48gx2ch 256^2b8) while the block-diagonal dense
    equivalent runs on the MXU.  True depthwise (cpg=1) measured FASTER
    under XLA (dense 0.26-0.96x) and stays native; cpg>2 has no call site
    and is unmeasured, so it stays native too."""
    return cpg == 2 and groups >= 8 and cin <= 1024


def _block_diag_weight(w, groups: int):
    """(cout, cpg, kh, kw) grouped weight -> (cout, groups*cpg, kh, kw) dense
    with the group blocks on the diagonal.  Exact: off-block zeros add
    nothing.  Traced per forward, but the expansion is a tiny broadcast
    multiply (cout*cin*k*k elements) vs the conv it feeds."""
    cout, cpg, kh, kw = w.shape
    opg = cout // groups
    eye = jnp.eye(groups, dtype=w.dtype)
    dense = jnp.einsum('gockw,gh->gohckw', w.reshape(groups, opg, cpg, kh, kw), eye)
    return dense.reshape(cout, groups * cpg, kh, kw)


def conv2d_int8(x, w8, w_scale, b=None, stride=1, padding=0, dilation=1):
    """int8 MXU conv: dynamic per-tensor activation quant, per-out-channel
    int8 weights, int32 accumulate, f32 rescale (resselt_tpu.quant).

    ``w8``: int8 OIHW; ``w_scale``: f32 (O,).  ~2x the bf16 conv rate on
    well-shaped channels (tools/probe_int8.py); quality cost measured in
    bench_int8.md.  groups != 1 is not supported (ineligible by design)."""
    sh, sw = _pair(stride)
    dh, dw = _pair(dilation)
    kh, kw = w8.shape[-2], w8.shape[-1]
    if padding == 'same':
        padding = ((kh - 1) * dh // 2, (kw - 1) * dw // 2)
    ph, pw = _pair(padding)
    orig = x.dtype
    xf = x.astype(jnp.float32)
    s_a = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / s_a), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq,
        w8,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=('NHWC', 'OIHW', 'NHWC'),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (w_scale.astype(jnp.float32) * s_a)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(orig)


def conv2d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1):
    """2-D convolution, torch semantics. ``x``: NHWC, ``w``: OIHW.

    ``padding`` may be an int, an (ph, pw) pair, or 'same' (odd kernels)."""
    if w.dtype == jnp.int8:
        raise TypeError(
            'int8 conv weight reached F.conv2d without its scale — route '
            'quantized convs through PTree.conv or F.conv2d_int8'
        )
    sh, sw = _pair(stride)
    dh, dw = _pair(dilation)
    kh, kw = w.shape[-2], w.shape[-1]
    if padding == 'same':
        padding = ((kh - 1) * dh // 2, (kw - 1) * dw // 2)
    ph, pw = _pair(padding)
    if (groups > 1 and _BLOCK_DIAG_GROUPS and jax.default_backend() != 'cpu'
            and _block_diag_supported(groups, w.shape[1], x.shape[-1])):
        w = _block_diag_weight(w, groups)
        groups = 1
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=('NHWC', 'OIHW', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d(x, w, b=None, stride=1, padding=0, output_padding=0, groups=1):
    """Torch ConvTranspose2d. ``w`` layout: (in, out/groups, kH, kW)."""
    if w.dtype == jnp.int8:
        raise TypeError(
            'int8 weight reached F.conv_transpose2d — transposed convs have '
            'no int8 path and are excluded by quantize_int8 discovery'
        )
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    kh, kw = w.shape[-2], w.shape[-1]
    # transposed conv = lhs-dilated conv with flipped kernel, swapped I/O
    w_flip = jnp.flip(w, axis=(-2, -1))
    if groups != 1:
        # (in, out/g, kh, kw) -> (g, in/g, out/g, kh, kw) -> (out, in/g, kh, kw)
        cin = w.shape[0]
        w_flip = w_flip.reshape(groups, cin // groups, *w.shape[1:])
        w_flip = jnp.moveaxis(w_flip, 2, 1).reshape(-1, cin // groups, kh, kw)
    else:
        w_flip = jnp.swapaxes(w_flip, 0, 1)
    y = jax.lax.conv_general_dilated(
        x,
        w_flip.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=('NHWC', 'OIHW', 'NHWC'),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def linear(x, w, b=None):
    """Torch Linear: ``w`` is (out, in); contracts against x's last dim."""
    y = jax.lax.dot_general(
        x,
        w.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Pixel shuffle / unshuffle (torch channel ordering)
# ---------------------------------------------------------------------------


def pixel_shuffle(x, r: int):
    n, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(n, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, co)


def pixel_unshuffle(x, r: int):
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h // r, w // r, c * r * r)


# ---------------------------------------------------------------------------
# Padding
# ---------------------------------------------------------------------------


def pad2d(x, pads, mode: str = 'constant', value: float = 0.0):
    """Torch ``F.pad`` on NHWC spatial dims. ``pads`` = (left, right, top, bottom).

    Negative pads crop (torch semantics, used by CUGAN's interior crops)."""
    left, right, top, bottom = pads

    def crop(arr, lo, hi, axis):
        if lo < 0:
            arr = jax.lax.slice_in_dim(arr, -lo, arr.shape[axis], axis=axis)
            lo = 0
        if hi < 0:
            arr = jax.lax.slice_in_dim(arr, 0, arr.shape[axis] + hi, axis=axis)
            hi = 0
        return arr, lo, hi

    x, top, bottom = crop(x, top, bottom, 1)
    x, left, right = crop(x, left, right, 2)
    if max(top, bottom, left, right) == 0:
        return x
    cfg = [(0, 0), (top, bottom), (left, right), (0, 0)]
    if mode == 'constant':
        return jnp.pad(x, cfg, mode='constant', constant_values=value)
    if mode == 'reflect':
        return jnp.pad(x, cfg, mode='reflect')
    if mode == 'replicate':
        return jnp.pad(x, cfg, mode='edge')
    if mode == 'circular':
        return jnp.pad(x, cfg, mode='wrap')
    raise ValueError(f'Unknown pad mode {mode}')


def pad_to_multiple(x, multiple: int, mode: str = 'reflect', value: float = 0.0):
    """Pad bottom/right so H and W are multiples of ``multiple``
    (reference: resselt/utilities/padding.py:5-29)."""
    h, w = x.shape[1], x.shape[2]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph == 0 and pw == 0:
        return x
    return pad2d(x, (0, pw, 0, ph), mode=mode, value=value)


# ---------------------------------------------------------------------------
# Activations (torch-exact)
# ---------------------------------------------------------------------------


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, x * negative_slope)


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    # torch default GELU is the exact erf form
    return x * 0.5 * (1.0 + jax.lax.erf(x / np.sqrt(2.0).astype(x.dtype)))


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def prelu(x, weight):
    w = weight.astype(x.dtype)
    if w.size != 1:
        w = w.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, x * w)


def softmax(x, axis=-1):
    return jax.nn.softmax(x, axis=axis)


ACTIVATIONS = {
    'relu': relu,
    'lrelu': leaky_relu,
    'leakyrelu': leaky_relu,
    'silu': silu,
    'gelu': gelu,
    'mish': mish,
    'sigmoid': sigmoid,
}


# ---------------------------------------------------------------------------
# Normalization (inference semantics)
# ---------------------------------------------------------------------------


def layer_norm(x, weight=None, bias=None, eps: float = 1e-5):
    """LayerNorm over the last dimension (channels-last)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def rms_norm(x, weight=None, offset: float = 0.0, eps: float = 1e-6):
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(ms + eps)
    if weight is not None:
        y = y * (weight.astype(x.dtype) + offset)
    return y


def batch_norm_2d(x, weight, bias, running_mean, running_var, eps: float = 1e-5):
    """Inference-mode BatchNorm2d over NHWC channels."""
    inv = jax.lax.rsqrt(running_var.astype(x.dtype) + eps)
    return (x - running_mean.astype(x.dtype)) * inv * weight.astype(x.dtype) + bias.astype(x.dtype)


def group_norm(x, num_groups: int, weight=None, bias=None, eps: float = 1e-5):
    n, h, w, c = x.shape
    xg = x.reshape(n, h, w, num_groups, c // num_groups)
    mu = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mu), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(n, h, w, c)
    if weight is not None:
        y = y * weight.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------


def adaptive_avg_pool_1x1(x):
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def avg_pool2d(x, kernel, stride=None, padding=0):
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, kh, kw, 1), (1, sh, sw, 1), [(0, 0), (ph, ph), (pw, pw), (0, 0)]
    )
    return y / (kh * kw)


def max_pool2d(x, kernel, stride=None, padding=0):
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, sh, sw, 1), [(0, 0), (ph, ph), (pw, pw), (0, 0)]
    )


# ---------------------------------------------------------------------------
# Interpolation (torch-exact index rules)
# ---------------------------------------------------------------------------


def interpolate_nearest(x, scale_factor=None, size=None):
    """torch F.interpolate(mode='nearest'): src = floor(dst * in/out)."""
    n, h, w, c = x.shape
    if size is not None:
        oh, ow = _pair(size)
    else:
        sfh, sfw = _scale_pair(scale_factor)
        oh, ow = int(h * sfh), int(w * sfw)
    if size is None and oh % h == 0 and ow % w == 0:
        return jnp.repeat(jnp.repeat(x, oh // h, axis=1), ow // w, axis=2)
    hi = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    wi = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, hi][:, :, wi]


def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    if align_corners and out_size > 1:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    i0 = np.clip(np.floor(src), 0, in_size - 1).astype(np.int64)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    frac = np.clip(src - np.floor(src), 0.0, 1.0)
    frac = np.where(src < 0, 0.0, frac)
    return i0, i1, frac.astype(np.float32)


def interpolate_bilinear(x, scale_factor=None, size=None, align_corners: bool = False):
    n, h, w, c = x.shape
    if size is not None:
        oh, ow = _pair(size)
    else:
        sfh, sfw = _scale_pair(scale_factor)
        oh, ow = int(h * sfh), int(w * sfw)
    i0, i1, fh = _linear_weights(h, oh, align_corners)
    j0, j1, fw = _linear_weights(w, ow, align_corners)
    fh = jnp.asarray(fh, x.dtype)[None, :, None, None]
    fw = jnp.asarray(fw, x.dtype)[None, None, :, None]
    top = x[:, i0]
    bot = x[:, i1]
    xh = top * (1 - fh) + bot * fh
    left = xh[:, :, j0]
    right = xh[:, :, j1]
    return left * (1 - fw) + right * fw


def _cubic_kernel(t, A: float = -0.75):
    at = np.abs(t)
    w = np.where(
        at <= 1,
        ((A + 2) * at - (A + 3)) * at * at + 1,
        np.where(at < 2, (((at - 5) * at + 8) * at - 4) * A, 0.0),
    )
    return w


def _cubic_weights(in_size: int, out_size: int, align_corners: bool):
    if align_corners and out_size > 1:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    idx = np.stack([base - 1, base, base + 1, base + 2], axis=1)
    t = np.stack([frac + 1, frac, 1 - frac, 2 - frac], axis=1)
    w = _cubic_kernel(t)
    idx = np.clip(idx, 0, in_size - 1)
    return idx, w.astype(np.float32)


def interpolate_bicubic(x, scale_factor=None, size=None, align_corners: bool = False):
    """torch bicubic (A=-0.75, no antialias)."""
    n, h, w, c = x.shape
    if size is not None:
        oh, ow = _pair(size)
    else:
        sfh, sfw = _scale_pair(scale_factor)
        oh, ow = int(h * sfh), int(w * sfw)
    ih, wh = _cubic_weights(h, oh, align_corners)
    iw, ww = _cubic_weights(w, ow, align_corners)
    wh = jnp.asarray(wh, x.dtype)
    ww = jnp.asarray(ww, x.dtype)
    # rows: gather (oh, 4) then weight-sum
    xr = x[:, ih.reshape(-1)].reshape(n, oh, 4, w, c)
    xr = (xr * wh[None, :, :, None, None]).sum(axis=2)
    xc = xr[:, :, iw.reshape(-1)].reshape(n, oh, ow, 4, c)
    return (xc * ww[None, None, :, :, None]).sum(axis=3)


def interpolate(x, scale_factor=None, size=None, mode='nearest', align_corners=False):
    if mode == 'nearest':
        return interpolate_nearest(x, scale_factor, size)
    if mode == 'bilinear':
        return interpolate_bilinear(x, scale_factor, size, align_corners)
    if mode == 'bicubic':
        return interpolate_bicubic(x, scale_factor, size, align_corners)
    raise ValueError(f'Unknown interpolation mode {mode}')


# ---------------------------------------------------------------------------
# grid_sample (bilinear), torch semantics
# ---------------------------------------------------------------------------


def grid_sample_bilinear(x, grid, align_corners: bool = False, padding_mode: str = 'zeros'):
    """``x``: NHWC, ``grid``: (N, Ho, Wo, 2) with xy in [-1, 1] (torch order:
    grid[..., 0] = x/width coord, grid[..., 1] = y/height coord)."""
    n, h, w, c = x.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        fx = (gx + 1) * 0.5 * (w - 1)
        fy = (gy + 1) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1) * w - 1) * 0.5
        fy = ((gy + 1) * h - 1) * 0.5

    if padding_mode not in ('zeros', 'border'):
        # torch also has 'reflection'; refuse rather than silently produce
        # border-extended values for it
        raise NotImplementedError(f'grid_sample padding_mode {padding_mode!r} not supported')
    if padding_mode == 'border':
        fx = jnp.clip(fx, 0, w - 1)
        fy = jnp.clip(fy, 0, h - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    xr = x.reshape(n * h * w, c)
    boff = (jnp.arange(n, dtype=jnp.int32) * (h * w)).reshape(n, 1, 1)

    def gather(yi, xi):
        # flattened (n*h*w, c) single-axis take: 2.7x a batched
        # multi-dim gather on v5e (tools/probe_gather.py)
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = (boff + yc * w + xc).reshape(-1)
        vals = jnp.take(xr, flat, axis=0).reshape(*yi.shape, c)
        if padding_mode == 'zeros':
            vals = jnp.where(valid[..., None], vals, 0)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    tx = tx[..., None]
    ty = ty[..., None]
    return (
        v00 * (1 - tx) * (1 - ty)
        + v01 * tx * (1 - ty)
        + v10 * (1 - tx) * ty
        + v11 * tx * ty
    )


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------


def channel_shuffle(x, groups: int):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    return x.swapaxes(3, 4).reshape(n, h, w, c)


def to_nhwc(x_nchw):
    return jnp.transpose(x_nchw, (0, 2, 3, 1))


def to_nchw(x_nhwc):
    return jnp.transpose(x_nhwc, (0, 3, 1, 2))


def rms_norm_ref(x, scale, offset, eps: float = 1e-6):
    """RMSNorm with eps added *outside* the sqrt, matching the reference's
    channel-dim RMSNorm (resselt/archs/mosrv2/arch.py:212-224)."""
    rms = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True))
    x_normed = x / (rms + eps)
    return scale.reshape(-1).astype(x.dtype) * x_normed + offset.reshape(-1).astype(x.dtype)


def hardsigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)
