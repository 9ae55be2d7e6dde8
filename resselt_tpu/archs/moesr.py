"""MoESR — Mamba-out Excitation Super-Resolution.

Parity with resselt/archs/moesr/{__init__.py,arch.py}: gated CNN blocks with
InceptionDWConv2d mixers grouped into Blocks + MSG (pixel-unshuffled gated
refinement), UniUpsample tail, pad-to-2 reflect + crop.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.upsample import SAMPLE_MODS, uni_upsample
from .mosrv2 import _inception_dwconv


@dataclass(frozen=True)
class MoESRConfig:
    in_ch: int
    out_ch: int
    scale: int
    dim: int
    n_blocks: int
    n_block: int
    expansion_factor: float
    expansion_msg: float
    upsampler: str
    upsample_dim: int


def _gated_block(p: PTree, x, dim: int, expansion_ratio: float):
    """GatedCNNBlock with LayerNorm + Inception mixer (moesr/arch.py:125-165)."""
    shortcut = x
    x = F.layer_norm(x, p['norm.weight'], p['norm.bias'], eps=1e-6)
    hidden = int(expansion_ratio * dim)
    x = p.conv('fc1', x, padding=1)
    g = x[..., :hidden]
    i = x[..., hidden : 2 * hidden - dim]
    c = x[..., 2 * hidden - dim :]
    c = _inception_dwconv(p.sub('conv'), c)
    x = F.mish(p.conv('fc2', F.mish(g) * jnp.concatenate([i, c], axis=-1), padding=1))
    return x * p['gamma'].reshape(-1).astype(x.dtype) + shortcut


def _msg(p: PTree, x, dim: int, expansion_msg: float):
    """MSG (moesr/arch.py:167-178)."""
    out = F.leaky_relu(F.pixel_unshuffle(p.conv('down.0', x, padding=1), 2), 0.1)
    for i in range(3):
        out = _gated_block(p.sub(f'gated.{i}'), out, dim, expansion_msg)
    out = F.leaky_relu(F.pixel_shuffle(p.conv('up.0', out, padding=1), 2), 0.1)
    return out + x


def apply(cfg: MoESRConfig, params, x):
    p = PTree(params)
    h, w = x.shape[1], x.shape[2]
    x = F.pad_to_multiple(x, 2, mode='reflect')
    x = p.conv('in_to_dim', x, padding=1)
    out = x
    for bi in range(cfg.n_blocks):
        bp = p.sub(f'blocks.{bi}')
        for i in range(cfg.n_block):
            out = _gated_block(bp.sub(f'blocks.{i}'), out, cfg.dim, cfg.expansion_factor)
        out = _msg(bp.sub('msg'), out, cfg.dim, cfg.expansion_msg)
    out = out + x
    out = uni_upsample(p.sub('upscale'), out, cfg.upsampler, cfg.scale, cfg.out_ch, cfg.upsample_dim)
    return out[:, : h * cfg.scale, : w * cfg.scale]


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/moesr/__init__.py:32-57)."""
    dim, in_ch = sd['in_to_dim.weight'].shape[:2]
    n_blocks = get_seq_len(sd, 'blocks')
    n_block = get_seq_len(sd, 'blocks.0.blocks')
    ef = sd['blocks.0.blocks.0.fc1.weight'].shape
    expansion_factor = (ef[0] / ef[1]) / 2
    em = sd['blocks.0.msg.gated.0.fc1.weight'].shape
    expansion_msg = (em[0] / em[1]) / 2
    meta_buf = [int(i) for i in sd['upscale.MetaUpsample'].reshape(-1)]
    _, index, scale, _, out_ch, upsample_dim, _ = meta_buf
    upsampler = SAMPLE_MODS[index]
    if upsampler == 'conv':
        scale = 1

    cfg = MoESRConfig(
        in_ch=in_ch, out_ch=out_ch, scale=scale, dim=dim, n_blocks=n_blocks,
        n_block=n_block, expansion_factor=expansion_factor, expansion_msg=expansion_msg,
        upsampler=upsampler, upsample_dim=upsample_dim,
    )
    params = {k: v for k, v in sd.items() if k != 'upscale.MetaUpsample'}
    meta = ModelMetadata(in_channels=in_ch, out_channels=out_ch, upscale=scale, name='MoESR')
    return SRModel('MoESR', cfg, params, meta, apply)


ARCH = Architecture(
    id='MoESR',
    detect_condition=KeyCondition.has_all(
        'in_to_dim.weight',
        'in_to_dim.bias',
        'blocks.0.blocks.0.gamma',
        'blocks.0.blocks.0.norm.weight',
        'blocks.0.blocks.0.norm.bias',
        'blocks.0.blocks.0.fc1.weight',
        'blocks.0.blocks.0.fc1.bias',
        'blocks.0.blocks.0.conv.dwconv_hw.weight',
        'blocks.0.blocks.0.conv.dwconv_hw.bias',
        'blocks.0.blocks.0.conv.dwconv_w.weight',
        'blocks.0.blocks.0.conv.dwconv_w.bias',
        'blocks.0.blocks.0.conv.dwconv_h.weight',
        'blocks.0.blocks.0.conv.dwconv_h.bias',
        'blocks.0.blocks.0.fc2.weight',
        'blocks.0.blocks.0.fc2.bias',
        'upscale.MetaUpsample',
    ),
    load_fn=_load,
)
