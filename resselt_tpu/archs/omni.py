"""OmniSR — omni-axis (spatial + channel) self-attention SR, MaxViT-style.

Parity with resselt/archs/omni/{__init__.py,arch.py}: OSA_Block with MBConv,
block & grid window attention (optional learned relative position bias),
channel/channel-grid attention with per-head temperature, gated conv FFNs,
ESA group gate; constant-pad window geometry (arch.py:962-974).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len, pixelshuffle_scale
from ..nn import functional as F
from ..nn.params import PTree


@dataclass(frozen=True)
class OmniConfig:
    num_in_ch: int
    num_out_ch: int
    num_feat: int
    block_num: int
    pe: bool
    window_size: int
    res_num: int
    up_scale: int
    bias: bool


def _mbconv(p: PTree, x, dim: int):
    """MBConv with expansion 1 + SE + residual (omni/arch.py:493-512)."""
    fn = p.sub('fn')
    y = F.gelu(fn.conv('0', x))
    y = F.gelu(fn.conv('2', y, padding=1, groups=dim))
    # SqueezeExcitation at fn.4 (gate: mean -> linear -> silu -> linear -> sigmoid)
    g = jnp.mean(y, axis=(1, 2))
    g = F.silu(F.linear(g, fn['4.gate.1.weight']))
    g = F.sigmoid(F.linear(g, fn['4.gate.3.weight']))
    y = y * g[:, None, None, :]
    y = fn.conv('5', y)
    return y + x


def _win_attention(p: PTree, xw, heads: int, pe: bool, ws: int):
    """Attention over (b', n, d) windows with optional embedding bias
    (omni/arch.py:514-597)."""
    bq, n, c = xw.shape
    hd = c // heads
    qkv = F.linear(xw, p['to_qkv.weight'])
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    q = q.reshape(bq, n, heads, hd).transpose(0, 2, 1, 3) * (hd**-0.5)
    k = k.reshape(bq, n, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(bq, n, heads, hd).transpose(0, 2, 1, 3)
    sim = jnp.einsum('bhnd,bhmd->bhnm', q, k, preferred_element_type=jnp.float32).astype(xw.dtype)
    if pe:
        import numpy as np

        pos = np.arange(ws)
        grid = np.stack(np.meshgrid(pos, pos, indexing='ij')).reshape(2, -1).T  # (n, 2)
        rel = grid[:, None, :] - grid[None, :, :] + ws - 1
        idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
        bias = p['rel_pos_bias.weight'][idx.reshape(-1)].reshape(n, n, heads)
        sim = sim + bias.transpose(2, 0, 1).astype(xw.dtype)[None]
    attn = F.softmax(sim)
    out = jnp.einsum('bhnm,bhmd->bhnd', attn, v, preferred_element_type=jnp.float32).astype(xw.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(bq, n, c)
    return F.linear(out, p['to_out.0.weight'])


def _block_windows(x, ws: int):
    """'b (x w1) (y w2) d' -> (b*x*y, w1*w2, d)"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c), (b, h, w, c)


def _block_unwindows(xw, ws: int, shape):
    b, h, w, c = shape
    x = xw.reshape(b, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _grid_windows(x, ws: int):
    """'b (w1 x) (w2 y) d' -> (b*x*y, w1*w2, d): strided/dilated windows."""
    b, h, w, c = x.shape
    xs, ys = h // ws, w // ws
    x = x.reshape(b, ws, xs, ws, ys, c).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(-1, ws * ws, c), (b, h, w, c)


def _grid_unwindows(xw, ws: int, shape):
    b, h, w, c = shape
    xs, ys = h // ws, w // ws
    x = xw.reshape(b, xs, ys, ws, ws, c).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, h, w, c)


def _ln2d(p: PTree, x):
    """LayerNorm2d: channel norm with (var + eps).sqrt (omni/arch.py:289-330)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) / jnp.sqrt(var + 1e-6)
    return y * p['norm.weight'].astype(x.dtype) + p['norm.bias'].astype(x.dtype)


def _gcff(p: PTree, x, dim: int):
    """Gated_Conv_FeedForward, mult=1, bias=False (omni/arch.py:415-444)."""
    fn = p.sub('fn')
    y = F.conv2d(x, fn['project_in.weight'])
    y = F.conv2d(y, fn['dwconv.weight'], padding=1, groups=2 * dim)
    x1, x2 = y[..., :dim], y[..., dim:]
    return F.conv2d(F.gelu(x1) * x2, fn['project_out.weight'])


def _channel_attn(p: PTree, x, ws: int, heads: int, grid: bool):
    """Channel_Attention / _grid (omni/arch.py:682-800).

    Window-first formulation: the reference's rearranges put window
    positions in the fastest-varying (lane) dim via 7-D transposes that
    cost 15-19 ms each at 256^2 b8 on TPU; partitioning with the cheap
    block/grid window reshapes and keeping channels last, with tokens
    contracted inside the einsums, computes the same attention 2.6-3.4x
    faster (tools/probe_omni_attn.py).  Exact for grid=True; bf16
    summation-order noise (~3e-3 rel) for grid=False."""
    fn = p.sub('fn')
    b, h, w, c = x.shape
    qkv = F.conv2d(x, fn['qkv.weight'])
    qkv = F.conv2d(qkv, fn['qkv_dwconv.weight'], padding=1, groups=3 * c)
    hd = c // heads
    X, Y = h // ws, w // ws

    if grid:
        # attention features span the (X, Y) grid; batch = in-window offset
        t = qkv.reshape(b, X, ws, Y, ws, 3 * c).transpose(0, 2, 4, 1, 3, 5)
        n = X * Y
    else:
        # attention features span the (ws, ws) window; batch = window index
        t = qkv.reshape(b, X, ws, Y, ws, 3 * c).transpose(0, 1, 3, 2, 4, 5)
        n = ws * ws
    t = t.reshape(-1, n, 3 * c)
    q = t[..., :c].reshape(-1, n, heads, hd)
    k = t[..., c : 2 * c].reshape(-1, n, heads, hd)
    v = t[..., 2 * c :].reshape(-1, n, heads, hd)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=1, keepdims=True), 1e-12)
    temp = fn['temperature'].astype(x.dtype).reshape(heads, 1, 1)
    attn = jnp.einsum('bnhd,bnhe->bhde', q, k, preferred_element_type=jnp.float32).astype(x.dtype)
    attn = F.softmax(attn * temp[None])
    out = jnp.einsum('bhde,bnhe->bnhd', attn, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(-1, n, c)
    if grid:
        out = out.reshape(b, ws, ws, X, Y, c).transpose(0, 3, 1, 4, 2, 5)
    else:
        out = out.reshape(b, X, Y, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return F.conv2d(out.reshape(b, h, w, c), fn['project_out.weight'])


def _osa_block(p: PTree, x, cfg: OmniConfig):
    """OSA_Block Sequential (omni/arch.py:802-864)."""
    ws = cfg.window_size
    dim = cfg.num_feat
    heads4 = dim // (dim // 4)
    x = _mbconv(p.sub('layer.0'), x, dim)

    # block attention (layer.2) with pre-LN over last dim
    q = p.sub('layer.2')
    xw, shape = _block_windows(x, ws)
    y = F.layer_norm(xw, q['norm.weight'], q['norm.bias'])
    y = _win_attention(q.sub('fn'), y, heads4, cfg.pe, ws)
    x = _block_unwindows(xw + y, ws, shape)

    q = p.sub('layer.4')
    x = _gcff(q, _ln2d(q, x), dim) + x
    q = p.sub('layer.5')
    x = _channel_attn(q, _ln2d(q, x), ws, 4, grid=False) + x
    q = p.sub('layer.6')
    x = _gcff(q, _ln2d(q, x), dim) + x

    # grid attention (layer.8)
    q = p.sub('layer.8')
    xw, shape = _grid_windows(x, ws)
    y = F.layer_norm(xw, q['norm.weight'], q['norm.bias'])
    y = _win_attention(q.sub('fn'), y, heads4, cfg.pe, ws)
    x = _grid_unwindows(xw + y, ws, shape)

    q = p.sub('layer.10')
    x = _gcff(q, _ln2d(q, x), dim) + x
    q = p.sub('layer.11')
    x = _channel_attn(q, _ln2d(q, x), ws, 4, grid=True) + x
    q = p.sub('layer.12')
    x = _gcff(q, _ln2d(q, x), dim) + x
    return x


def _esa(p: PTree, x):
    """ESA spatial gate (omni/arch.py:18-47)."""
    c1_ = p.conv('conv1', x)
    c1 = p.conv('conv2', c1_, stride=2)
    v_max = F.max_pool2d(c1, 7, stride=3)
    c3 = p.conv('conv3', v_max, padding=1)
    c3 = F.interpolate_bilinear(c3, size=(x.shape[1], x.shape[2]), align_corners=False)
    cf = p.conv('conv_f', c1_)
    c4 = p.conv('conv4', c3 + cf)
    return x * F.sigmoid(c4)


def apply(cfg: OmniConfig, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    x = F.pad_to_multiple(x, cfg.window_size, mode='constant')

    residual = p.conv('input', x, padding=1)
    out = residual
    for ri in range(cfg.res_num):
        rp = p.sub(f'residual_layer.{ri}')
        y = out
        for bi in range(cfg.block_num):
            y = _osa_block(rp.sub(f'residual_layer.{bi}'), y, cfg)
        y = rp.conv(f'residual_layer.{cfg.block_num}', y)
        y = y + out
        out = _esa(rp.sub('esa'), y)
    out = p.conv('output', out, padding=1) + residual
    out = F.pixel_shuffle(p.conv('up.0', out, padding=1), cfg.up_scale)
    return out[:, : h0 * cfg.up_scale, : w0 * cfg.up_scale]


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/omni/__init__.py:24-63)."""
    sd = {k: v for k, v in sd.items() if not k.endswith(('total_ops', 'total_params'))}
    window_size = 8

    num_feat = sd['input.weight'].shape[0]
    num_in_ch = sd['input.weight'].shape[1]
    bias = 'input.bias' in sd
    up_scale = pixelshuffle_scale(sd['up.0.weight'].shape[0], num_in_ch)
    res_num = get_seq_len(sd, 'residual_layer')
    block_num = get_seq_len(sd, 'residual_layer.0.residual_layer') - 1

    rel_key = 'residual_layer.0.residual_layer.0.layer.2.fn.rel_pos_bias.weight'
    if rel_key in sd:
        pe = True
        window_size = int((math.sqrt(sd[rel_key].shape[0]) + 1) / 2)
    else:
        pe = False

    cfg = OmniConfig(
        num_in_ch=num_in_ch, num_out_ch=num_in_ch, num_feat=num_feat, block_num=block_num,
        pe=pe, window_size=window_size, res_num=res_num, up_scale=up_scale, bias=bias,
    )
    meta = ModelMetadata(in_channels=num_in_ch, out_channels=num_in_ch, upscale=up_scale, name='OmniSR')
    return SRModel('OmniSR', cfg, sd, meta, apply)


ARCH = Architecture(
    id='OmniSR',
    detect_condition=KeyCondition.has_all(
        'residual_layer.0.residual_layer.0.layer.0.fn.0.weight',
        'input.weight',
        'up.0.weight',
    ),
    load_fn=_load,
)
