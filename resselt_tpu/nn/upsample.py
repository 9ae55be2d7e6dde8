"""Shared upsampler implementations (DySample, pixel-shuffle tails, the
UniUpsample mode families used by the MoSR/GateR/GFISR lineages)."""

from __future__ import annotations

import jax.numpy as jnp

from . import functional as F
from .params import PTree


def dysample(p: PTree, x, scale: int, groups: int = 4, end_convolution: bool = True):
    """Content-adaptive upsampling (reference: resselt/utilities/dysample.py:6-83).

    ``p`` scopes the DySample module keys: offset.{weight,bias},
    scope.weight, init_pos, [end_conv.{weight,bias}]."""
    n, h, w, c = x.shape
    s = scale
    g = groups

    offset = p.conv('offset', x)
    scope = F.conv2d(x, p['scope.weight'])
    init_pos = p['init_pos'].reshape(-1).astype(x.dtype)  # (2*g*s*s,)
    offset = offset * F.sigmoid(scope) * 0.5 + init_pos

    # channel layout is [2, g, s, s] row-major (see DySample._init_pos)
    off = offset.reshape(n, h, w, 2, g, s, s)

    # normalized sample coordinates; component 0 = x/W, 1 = y/H
    xs = (jnp.arange(w, dtype=x.dtype) + 0.5).reshape(1, 1, w, 1, 1, 1)
    ys = (jnp.arange(h, dtype=x.dtype) + 0.5).reshape(1, h, 1, 1, 1, 1)
    cx = 2 * (xs + off[:, :, :, 0]) / w - 1
    cy = 2 * (ys + off[:, :, :, 1]) / h - 1
    coords = jnp.stack([cx, cy], axis=-1)  # (n, h, w, g, s, s, 2)

    # grid[b, gi, h*s+i, w*s+j] = coords[b, h, w, gi, i, j]
    grid = coords.transpose(0, 3, 1, 4, 2, 5, 6).reshape(n * g, h * s, w * s, 2)

    xg = x.reshape(n, h, w, g, c // g).transpose(0, 3, 1, 2, 4).reshape(n * g, h, w, c // g)
    out = F.grid_sample_bilinear(xg, grid, align_corners=False, padding_mode='border')
    out = out.reshape(n, g, h * s, w * s, c // g).transpose(0, 2, 3, 1, 4).reshape(n, h * s, w * s, c)

    if end_convolution:
        out = p.conv('end_conv', out)
    return out


def conv_pixel_shuffle(p: PTree, x, conv_key: str, scale: int, padding='same'):
    """conv3x3 -> PixelShuffle tail."""
    return F.pixel_shuffle(p.conv(conv_key, x, padding=padding), scale)


SAMPLE_MODS = ('conv', 'pixelshuffledirect', 'pixelshuffle', 'nearest+conv', 'dysample')


def uni_upsample(p: PTree, x, mode: str, scale: int, out_dim: int, mid_dim: int, group: int = 4):
    """UniUpsample (reference: resselt/archs/mosrv2/arch.py:91-171).

    ``p`` scopes the UniUpsample Sequential; layer indices follow the torch
    module list layout exactly."""
    import math

    in_dim = x.shape[-1]
    if scale == 1 or mode == 'conv':
        return p.conv('0', x, padding=1)
    if mode == 'pixelshuffledirect':
        return F.pixel_shuffle(p.conv('0', x, padding=1), scale)
    if mode == 'pixelshuffle':
        x = F.leaky_relu(p.conv('0', x, padding=1), 0.01)
        idx = 2
        if (scale & (scale - 1)) == 0:
            for _ in range(int(math.log2(scale))):
                x = F.pixel_shuffle(p.conv(str(idx), x, padding=1), 2)
                idx += 2
        elif scale == 3:
            x = F.pixel_shuffle(p.conv(str(idx), x, padding=1), 3)
            idx += 2
        else:
            raise ValueError(f'scale {scale} unsupported for pixelshuffle')
        return p.conv(str(idx), x, padding=1)
    if mode == 'nearest+conv':
        if (scale & (scale - 1)) == 0:
            idx = 0
            for _ in range(int(math.log2(scale))):
                x = F.leaky_relu(F.interpolate_nearest(p.conv(str(idx), x, padding=1), scale_factor=2), 0.2)
                idx += 3
            x = F.leaky_relu(p.conv(str(idx), x, padding=1), 0.2)
            return p.conv(str(idx + 2), x, padding=1)
        if scale == 3:
            x = F.leaky_relu(F.interpolate_nearest(p.conv('0', x, padding=1), scale_factor=3), 0.2)
            x = F.leaky_relu(p.conv('3', x, padding=1), 0.2)
            return p.conv('5', x, padding=1)
        raise ValueError(f'scale {scale} unsupported for nearest+conv')
    if mode == 'dysample':
        if mid_dim != in_dim:
            x = F.leaky_relu(p.conv('0', x, padding=1), 0.01)
            return dysample(p.sub('2'), x, scale, groups=group)
        return dysample(p.sub('0'), x, scale, groups=group)
    raise ValueError(f'Unknown UniUpsample mode {mode}')


SAMPLE_MODS3 = SAMPLE_MODS + ('transpose+conv', 'lda', 'pa_up')


def lda_aqu(p: PTree, x, scale_factor: int, range_factor: float = 11.0):
    """LDA_AQU deformable-kernel attention upsampler
    (reference: resselt/archs/fdat/arch.py:135-279).

    Hyperparameters are recovered from weight shapes; ``base_offset`` is a
    non-persistent buffer and is recomputed here."""
    import numpy as np
    import jax

    b, h, w, c = x.shape
    hidden = p['proj_q.weight'].shape[0]
    group_channel = p['conv_offset.0.weight'].shape[0]
    g = hidden // group_channel
    two_ku2 = p['conv_offset.3.weight'].shape[0]
    k_u = int(np.sqrt(two_ku2 // 2))
    k_e = p['conv_offset.3.weight'].shape[-1]
    rpb = 'relative_position_bias_table' in p
    nh = p['relative_position_bias_table'].shape[1] if rpb else 1
    attn_dim = hidden // nh
    scale = attn_dim**-0.5
    oh, ow = int(h * scale_factor), int(w * scale_factor)

    v = x
    xn = F.layer_norm(x, p['layer_norm.weight'], p['layer_norm.bias'], eps=1e-6)
    q = F.conv2d(xn, p['proj_q.weight'])
    k = F.conv2d(xn, p['proj_k.weight'])
    q = F.interpolate_bilinear(q, size=(oh, ow), align_corners=True)

    # offsets per group
    qg = q.reshape(b, oh, ow, g, hidden // g).transpose(0, 3, 1, 2, 4).reshape(b * g, oh, ow, hidden // g)
    off = F.conv2d(qg, p['conv_offset.0.weight'], padding=1, groups=group_channel)
    off = F.layer_norm(off, p['conv_offset.1.weight'], p['conv_offset.1.bias'], eps=1e-6)
    off = F.conv2d(F.silu(off), p['conv_offset.3.weight'], p['conv_offset.3.bias'], padding=k_e // 2)

    pad = (k_u - 1) // 2
    base = np.arange(-pad, pad + 1, dtype=np.float32)
    base_y = np.repeat(base, k_u)
    base_x = np.tile(base, k_u)
    base_offset = np.stack([base_y, base_x], axis=1).reshape(-1)  # (2*k_u*k_u,)
    off = jnp.tanh(off) * range_factor + jnp.asarray(base_offset, x.dtype)

    # build sample grid (align_corners=True normalization)
    off = off.reshape(b * g, oh, ow, k_u, k_u, 2)
    ys = jnp.arange(oh, dtype=x.dtype).reshape(1, oh, 1, 1, 1)
    xs = jnp.arange(ow, dtype=x.dtype).reshape(1, 1, ow, 1, 1)
    oy = off[..., 0] + ys
    ox = off[..., 1] + xs
    ny = 2 * oy / (oh - 1) - 1
    nx = 2 * ox / (ow - 1) - 1
    grid = jnp.stack([nx, ny], axis=-1)  # (b*g, oh, ow, k_u, k_u, 2), xy order
    grid = grid.transpose(0, 3, 1, 4, 2, 5).reshape(b * g, k_u * oh, k_u * ow, 2)

    def group_split(t):
        ch = t.shape[-1]
        return t.reshape(b, h, w, g, ch // g).transpose(0, 3, 1, 2, 4).reshape(b * g, h, w, ch // g)

    kg = group_split(k)
    vg = group_split(v)
    ks = F.grid_sample_bilinear(kg, grid, align_corners=True, padding_mode='zeros')
    vs = F.grid_sample_bilinear(vg, grid, align_corners=True, padding_mode='zeros')

    def windows(t):
        ch = t.shape[-1]
        t = t.reshape(b, g, k_u, oh, k_u, ow, ch)
        # -> (b, oh*ow, k_u*k_u, g*ch)
        t = t.transpose(0, 3, 5, 2, 4, 1, 6).reshape(b, oh * ow, k_u * k_u, g * ch)
        return t

    ks = windows(ks).reshape(b, oh * ow, k_u * k_u, nh, attn_dim).transpose(0, 3, 1, 2, 4)
    cv = c // nh
    vs = windows(vs).reshape(b, oh * ow, k_u * k_u, nh, cv).transpose(0, 3, 1, 2, 4)
    if rpb:
        ks = ks + p['relative_position_bias_table'].reshape(1, nh, 1, k_u * k_u, attn_dim).astype(x.dtype)

    qh = q.reshape(b, oh * ow, nh, attn_dim).transpose(0, 2, 1, 3)[:, :, :, None, :]  # (b, nh, n1, 1, c)
    attn = jnp.einsum('bhnoc,bhnkc->bhnok', qh * scale, ks, preferred_element_type=jnp.float32).astype(x.dtype)
    attn = F.softmax(attn)
    out = jnp.einsum('bhnok,bhnkc->bhnoc', attn, vs, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out[:, :, :, 0, :].transpose(0, 2, 1, 3).reshape(b, oh, ow, nh * cv)
    return out


def uni_upsample_v3(p: PTree, x, mode: str, scale: int, out_dim: int, mid_dim: int,
                    group: int = 4, dysample_end_kernel: int = 1):
    """UniUpsampleV3, 8 modes (reference: resselt/archs/fdat/arch.py:290-443)."""
    import math

    in_dim = x.shape[-1]
    if scale == 1:
        # reference builds a single conv for scale 1 REGARDLESS of mode
        # (fdat/arch.py:304: `if scale == 1 or upsample == "conv"`), so a
        # 1x checkpoint has only '0.weight'/'0.bias' even when MetaUpsample
        # records dysample/lda/transpose+conv/pa_up
        return p.conv('0', x, padding=1)
    if mode in SAMPLE_MODS and mode != 'dysample':
        return uni_upsample(p, x, mode, scale, out_dim, mid_dim, group)
    if mode == 'dysample':
        if mid_dim != in_dim:
            x = F.leaky_relu(p.conv('0', x, padding=1), 0.01)
            dys = p.sub('2')
        else:
            dys = p.sub('0')
        n, h, w, c = x.shape
        out = dysample(dys, x, scale, groups=group, end_convolution=False)
        ek = dysample_end_kernel
        return F.conv2d(out, dys['end_conv.weight'], dys.get('end_conv.bias'), padding=ek // 2)
    if mode == 'transpose+conv':
        if scale == 2:
            x = F.conv_transpose2d(x, p['0.weight'], p.get('0.bias'), stride=2, padding=1)
            return p.conv('1', x, padding=1)
        if scale == 3:
            x = F.conv_transpose2d(x, p['0.weight'], p.get('0.bias'), stride=3, padding=0)
            return p.conv('1', x, padding=1)
        if scale == 4:
            x = F.gelu(F.conv_transpose2d(x, p['0.weight'], p.get('0.bias'), stride=2, padding=1))
            x = F.conv_transpose2d(x, p['2.weight'], p.get('2.bias'), stride=2, padding=1)
            return p.conv('3', x, padding=1)
        raise ValueError(f'transpose+conv scale {scale} unsupported')
    if mode == 'lda':
        if mid_dim != in_dim:
            x = F.leaky_relu(p.conv('0', x, padding=1), 0.01)
            x = lda_aqu(p.sub('2'), x, scale)
            return p.conv('3', x, padding=1)
        x = lda_aqu(p.sub('0'), x, scale)
        return p.conv('1', x, padding=1)
    if mode == 'pa_up':
        if (scale & (scale - 1)) == 0:
            n_stages = int(math.log2(scale))
            idx = 0
            for _ in range(n_stages):
                x = F.interpolate_nearest(x, scale_factor=2)
                x = p.conv(str(idx + 1), x, padding=1)
                x = x * F.sigmoid(p.conv(f'{idx + 2}.conv.0', x))
                x = F.leaky_relu(x, 0.2)
                x = F.leaky_relu(p.conv(str(idx + 4), x, padding=1), 0.2)
                idx += 6
            return p.conv(str(idx), x, padding=1)
        if scale == 3:
            x = F.interpolate_nearest(x, scale_factor=3)
            x = p.conv('1', x, padding=1)
            x = x * F.sigmoid(p.conv('2.conv.0', x))
            x = F.leaky_relu(x, 0.2)
            x = F.leaky_relu(p.conv('4', x, padding=1), 0.2)
            return p.conv('6', x, padding=1)
        raise ValueError(f'pa_up scale {scale} unsupported')
    raise ValueError(f'Unknown UniUpsampleV3 mode {mode}')
