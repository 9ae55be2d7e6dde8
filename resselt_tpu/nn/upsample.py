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
