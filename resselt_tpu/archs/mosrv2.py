"""MoSRv2 — Mamba-Out SR v2 with UniUpsample and MetaUpsample config buffer.

Parity with resselt/archs/mosrv2/{__init__.py,arch.py}: InceptionDWConv2d
token mixer, RMSNorm/LayerNorm switch, optional input pixel-unshuffle,
bilinear ``short`` branch, MetaUpsample uint8 buffer decoding
(arch.py:157-171).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.upsample import SAMPLE_MODS, uni_upsample


@dataclass(frozen=True)
class MoSRv2Config:
    in_ch: int
    scale: int
    n_block: int
    dim: int
    upsampler: str
    expansion_ratio: float
    mid_dim: int
    group: int
    unshuffle_mod: bool
    rms_norm: bool


def _inception_dwconv(p: PTree, x):
    """InceptionDWConv2d (mosrv2/arch.py:174-209)."""
    gc = p['dwconv_hw.weight'].shape[0]
    c = x.shape[-1]
    x_id = x[..., : c - 3 * gc]
    x_hw = x[..., c - 3 * gc : c - 2 * gc]
    x_w = x[..., c - 2 * gc : c - gc]
    x_h = x[..., c - gc :]
    sq = p['dwconv_hw.weight'].shape[-1]
    band = p['dwconv_w.weight'].shape[-1]
    return jnp.concatenate(
        [
            x_id,
            p.conv('dwconv_hw', x_hw, padding=sq // 2, groups=gc),
            p.conv('dwconv_w', x_w, padding=(0, band // 2), groups=gc),
            p.conv('dwconv_h', x_h, padding=(band // 2, 0), groups=gc),
        ],
        axis=-1,
    )


def _gated_block(p: PTree, x, cfg: MoSRv2Config):
    """GatedCNNBlock v2 (mosrv2/arch.py:244-278)."""
    shortcut = x
    if cfg.rms_norm:
        x = F.rms_norm_ref(x, p['norm.scale'], p['norm.offset'])
    else:
        x = F.layer_norm(x, p['norm.weight'], p['norm.bias'], eps=1e-6)
    hidden = int(cfg.expansion_ratio * cfg.dim)
    conv_channels = cfg.dim
    x = p.conv('fc1', x, padding=1)
    g = x[..., :hidden]
    i = x[..., hidden : 2 * hidden - conv_channels]
    c = x[..., 2 * hidden - conv_channels :]
    c = _inception_dwconv(p.sub('conv'), c)
    x = F.mish(p.conv('fc2', F.mish(g) * jnp.concatenate([i, c], axis=-1), padding=1))
    return x * p['gamma'].reshape(-1).astype(x.dtype) + shortcut


def apply(cfg: MoSRv2Config, params, x):
    p = PTree(params)
    h, w = x.shape[1], x.shape[2]
    pad = 4 // cfg.scale if (cfg.unshuffle_mod and cfg.scale < 3) else 1
    x = F.pad_to_multiple(x, pad, mode='reflect')
    short = F.interpolate_bilinear(x, scale_factor=cfg.scale)

    if cfg.unshuffle_mod and cfg.scale < 3:
        out = F.pixel_unshuffle(x, pad)
        out = p.conv('gblocks.1', out, padding=1)
        first = 2
    else:
        out = p.conv('gblocks.0', x, padding=1)
        first = 1
    for i in range(cfg.n_block):
        out = _gated_block(p.sub(f'gblocks.{first + i}'), out, cfg)
    i0 = first + cfg.n_block
    out = F.mish(p.conv(f'gblocks.{i0}', out, padding=1))
    out = F.mish(p.conv(f'gblocks.{i0 + 2}', out, padding=1))
    out = p.conv(f'gblocks.{i0 + 4}', out)

    to_img_scale = 4 if (cfg.unshuffle_mod and cfg.scale < 3) else cfg.scale
    out = uni_upsample(p.sub('to_img'), out, cfg.upsampler, to_img_scale, cfg.in_ch, cfg.mid_dim, cfg.group)
    out = out + short
    return out[:, : h * cfg.scale, : w * cfg.scale]


def _load(sd) -> SRModel:
    """Config inference incl. MetaUpsample decoding
    (resselt/archs/mosrv2/__init__.py:62-92)."""
    meta_buf = [int(i) for i in sd['to_img.MetaUpsample'].reshape(-1)]
    _, upsampler_idx, scale, dim, in_ch, mid_dim, group = meta_buf
    upsampler = SAMPLE_MODS[upsampler_idx]
    n_block = get_seq_len(sd, 'gblocks')
    if 'gblocks.0.weight' in sd:
        unshuffle_mod = False
        n_block -= 6
        expansion_ratio = sd['gblocks.1.fc1.weight'].shape[0] // 2 / dim
        rms_norm = 'gblocks.1.norm.scale' in sd
    else:
        scale = math.isqrt(sd['gblocks.1.weight'].shape[1] // in_ch)
        n_block -= 7
        unshuffle_mod = True
        expansion_ratio = sd['gblocks.2.fc1.weight'].shape[0] // 2 / dim
        rms_norm = 'gblocks.2.norm.scale' in sd

    cfg = MoSRv2Config(
        in_ch=in_ch, scale=scale, n_block=n_block, dim=dim, upsampler=upsampler,
        expansion_ratio=expansion_ratio, mid_dim=mid_dim, group=group,
        unshuffle_mod=unshuffle_mod, rms_norm=rms_norm,
    )
    params = {k: v for k, v in sd.items() if k != 'to_img.MetaUpsample'}
    meta = ModelMetadata(in_channels=in_ch, out_channels=in_ch, upscale=scale, name='MoSRv2')
    return SRModel('MoSRv2', cfg, params, meta, apply)


def _block_cond(idx: int) -> KeyCondition:
    g = f'gblocks.{idx}'
    return KeyCondition.has_all(
        f'gblocks.{idx - 1}.weight',
        f'gblocks.{idx - 1}.bias',
        f'{g}.gamma',
        KeyCondition.has_any(
            KeyCondition.has_all(f'{g}.norm.scale', f'{g}.norm.offset'),
            KeyCondition.has_all(f'{g}.norm.weight', f'{g}.norm.bias'),
        ),
        f'{g}.fc1.weight',
        f'{g}.fc1.bias',
        f'{g}.conv.dwconv_hw.weight',
        f'{g}.conv.dwconv_hw.bias',
        f'{g}.conv.dwconv_w.weight',
        f'{g}.conv.dwconv_w.bias',
        f'{g}.conv.dwconv_h.weight',
        f'{g}.conv.dwconv_h.bias',
        f'{g}.fc2.weight',
        f'{g}.fc2.bias',
        'to_img.MetaUpsample',
        'to_img.0.weight',
        'to_img.0.bias',
    )


ARCH = Architecture(
    id='MoSRv2',
    detect_condition=KeyCondition.has_any(_block_cond(2), _block_cond(1)),
    load_fn=_load,
)
