"""MoSR — Mamba-Out Super-Resolution.

Parity with resselt/archs/mosr/{__init__.py,arch.py}.  Includes the GPS
(8-way geo-ensemble pixel shuffle) upsampler (arch.py:8-32) and the
``(shortcut - 0.5)`` residual quirk (arch.py:105,155).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import dysample_scale, get_seq_len, pixelshuffle_scale
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.upsample import conv_pixel_shuffle, dysample


@dataclass(frozen=True)
class MoSRConfig:
    in_ch: int
    out_ch: int
    n_block: int
    upscale: int
    dim: int
    upsampler: str  # 'ps' | 'dys' | 'gps'
    expansion_ratio: float
    conv_ratio: float
    kernel_size: int


def gated_cnn_block(p: PTree, x, dim: int, expansion_ratio: float, conv_ratio: float,
                    kernel_size: int, act=F.mish, ln_eps: float = 1e-6):
    """MambaOut gated CNN block (mosr/arch.py:72-106); shared with MoESR."""
    shortcut = x
    x = F.layer_norm(x, p['norm.weight'], p['norm.bias'], eps=ln_eps)
    hidden = int(expansion_ratio * dim)
    conv_channels = int(conv_ratio * dim)
    x = p.conv('fc1', x, padding=1)
    g = x[..., :hidden]
    i = x[..., hidden : 2 * hidden - conv_channels]
    c = x[..., 2 * hidden - conv_channels :]
    c = p.conv('conv', c, padding=kernel_size // 2, groups=conv_channels)
    x = act(p.conv('fc2', act(g) * jnp.concatenate([i, c], axis=-1), padding=1))
    return x + (shortcut - 0.5)


def _conv_block_shortcut(p: PTree, x):
    """ConvBlock (mosr/arch.py:49-69)."""
    out1 = F.mish(p.conv('block.0', x, padding=1))
    out1 = F.mish(p.conv('block.2', out1, padding=1))
    return out1 + p.conv('conv11', x)


def _gps(p: PTree, x, scale: int):
    """Geo-ensemble pixel shuffle (mosr/arch.py:8-32)."""
    k = p['in_to_k.weight'].shape[-1]
    x = p.conv('in_to_k', x, padding=k // 2)
    n, h, w, c = x.shape
    # torch reshape (N, 8, C/8, H, W): NHWC channel split [8, c//8]
    x = x.reshape(n, h, w, 8, c // 8).mean(axis=3)
    return F.pixel_shuffle(x, scale)


def apply(cfg: MoSRConfig, params, x):
    p = PTree(params)
    out = p.conv('gblocks.0', x, padding=1)
    for i in range(cfg.n_block):
        out = gated_cnn_block(
            p.sub(f'gblocks.{i + 1}'), out, cfg.dim, cfg.expansion_ratio, cfg.conv_ratio, cfg.kernel_size
        )
    # tail: conv3x3 -> mish -> conv3x3 -> mish -> conv1x1 (arch.py:133)
    i0 = cfg.n_block + 1
    out = F.mish(p.conv(f'gblocks.{i0}', out, padding=1))
    out = F.mish(p.conv(f'gblocks.{i0 + 2}', out, padding=1))
    out = p.conv(f'gblocks.{i0 + 4}', out)

    out = out + (_conv_block_shortcut(p.sub('shortcut'), x) - 0.5)

    if cfg.upsampler == 'ps':
        return conv_pixel_shuffle(p, out, 'upsampler.0', cfg.upscale, padding=1)
    if cfg.upsampler == 'dys':
        return dysample(p.sub('upsampler'), out, cfg.upscale)
    return _gps(p.sub('upsampler'), out, cfg.upscale)


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/mosr/__init__.py:27-64)."""
    n_block = get_seq_len(sd, 'gblocks') - 6
    in_ch = sd['gblocks.0.weight'].shape[1]
    dim = sd['gblocks.0.weight'].shape[0]
    expansion_ratio = (sd['gblocks.1.fc1.weight'].shape[0] / sd['gblocks.1.fc1.weight'].shape[1]) / 2
    conv_ratio = sd['gblocks.1.conv.weight'].shape[0] / dim
    kernel_size = sd['gblocks.1.conv.weight'].shape[2]

    if 'upsampler.init_pos' in sd:
        upsampler = 'dys'
        out_ch = sd['upsampler.end_conv.weight'].shape[0]
        upscale = dysample_scale(sd['upsampler.offset.weight'].shape[0])
    elif 'upsampler.in_to_k.weight' in sd:
        upsampler = 'gps'
        out_ch = in_ch
        upscale = math.isqrt(sd['upsampler.in_to_k.weight'].shape[0] // 8 // out_ch)
    else:
        upsampler = 'ps'
        out_ch = in_ch
        upscale = pixelshuffle_scale(sd['upsampler.0.weight'].shape[0], out_ch)

    cfg = MoSRConfig(
        in_ch=in_ch, out_ch=out_ch, n_block=n_block, upscale=upscale, dim=dim,
        upsampler=upsampler, expansion_ratio=expansion_ratio, conv_ratio=conv_ratio,
        kernel_size=kernel_size,
    )
    meta = ModelMetadata(in_channels=in_ch, out_channels=out_ch, upscale=upscale, name='MoSR')
    return SRModel('MoSR', cfg, dict(sd), meta, apply)


ARCH = Architecture(
    id='MoSR',
    detect_condition=KeyCondition.has_all(
        'gblocks.0.weight',
        'gblocks.0.bias',
        'gblocks.1.norm.weight',
        'gblocks.1.norm.bias',
        'gblocks.1.fc1.weight',
        'gblocks.1.fc1.bias',
        'gblocks.1.conv.weight',
        'gblocks.1.conv.bias',
        'gblocks.1.fc2.weight',
        'gblocks.1.fc2.bias',
    ),
    load_fn=_load,
)
