"""RCAN — Residual Channel Attention Network.

Parity with resselt/archs/rcan/{__init__.py,arch.py}: MeanShift 1x1 convs
(weights come from the checkpoint when norm=True), RCAB channel attention,
pixel-shuffle Upsampler tail, optional pixel-unshuffle head.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_pixelshuffle_params, get_seq_len
from ..nn import functional as F
from ..nn.params import PTree


@dataclass(frozen=True)
class RCANConfig:
    scale: int
    n_resgroups: int
    n_resblocks: int
    n_feats: int
    n_colors: int
    rgb_range: int
    norm: bool
    kernel_size: int
    reduction: int
    unshuffle_mod: bool


def _rcab(p: PTree, x, k: int):
    """Residual Channel Attention Block (rcan/arch.py:168-196)."""
    res = F.relu(p.conv('body.0', x, padding=k // 2))
    res = p.conv('body.2', res, padding=k // 2)
    # CALayer at body.3
    y = jnp.mean(res, axis=(1, 2), keepdims=True)
    y = F.relu(p.conv('body.3.conv_du.0', y))
    y = F.sigmoid(p.conv('body.3.conv_du.2', y))
    return res * y + x


def apply(cfg: RCANConfig, params, x):
    p = PTree(params)
    k = cfg.kernel_size
    h, w = x.shape[1], x.shape[2]
    unshuffle = cfg.unshuffle_mod and cfg.scale <= 2
    downscale = 4 // cfg.scale if unshuffle else 1
    x = F.pad_to_multiple(x, downscale, mode='reflect')
    x = x * cfg.rgb_range
    if cfg.norm:
        x = p.conv('sub_mean', x)
    if unshuffle:
        x = F.pixel_unshuffle(x, downscale)
        x = p.conv('head.1', x, padding=k // 2)
    else:
        x = p.conv('head.0', x, padding=k // 2)

    res = x
    for g in range(cfg.n_resgroups):
        gp = p.sub(f'body.{g}')
        r = res
        for b in range(cfg.n_resblocks):
            r = _rcab(gp.sub(f'body.{b}'), r, k)
        r = gp.conv(f'body.{cfg.n_resblocks}', r, padding=k // 2)
        res = res + r
    res = p.conv(f'body.{cfg.n_resgroups}', res, padding=k // 2)
    x = x + res

    tail_scale = 4 if unshuffle else cfg.scale
    if tail_scale & (tail_scale - 1) == 0:
        for i in range(int(math.log2(tail_scale))):
            x = F.pixel_shuffle(p.conv(f'tail.0.{2 * i}', x, padding=1), 2)
    elif tail_scale == 3:
        x = F.pixel_shuffle(p.conv('tail.0.0', x, padding=1), 3)
    x = p.conv('tail.1', x, padding=k // 2)
    if cfg.norm:
        x = p.conv('add_mean', x)
    return (x / cfg.rgb_range)[:, : h * cfg.scale, : w * cfg.scale]


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/rcan/__init__.py:29-63)."""
    n_resgroups = get_seq_len(sd, 'body') - 1
    n_resblocks = get_seq_len(sd, 'body.0.body') - 1
    head_index = 0
    scale, n_feats = get_pixelshuffle_params(sd, 'tail.0')
    unshuffle_mod = get_seq_len(sd, 'head') > 1
    n_colors = sd['tail.1.weight'].shape[0]
    if unshuffle_mod:
        head_index += 1
        unshuffled_channels = sd[f'head.{head_index}.weight'].shape[1]
        downscale_factor = int(math.sqrt(unshuffled_channels / n_colors))
        scale = 4 // downscale_factor
    norm = 'sub_mean.weight' in sd
    rgb_range = 255 if norm else 1  # undetectable; runtime uses 1 when no norm (arch.py:264-270)
    kernel_size = sd[f'head.{head_index}.weight'].shape[-1]
    reduction = n_feats // sd['body.0.body.0.body.3.conv_du.0.weight'].shape[0]

    cfg = RCANConfig(
        scale=scale, n_resgroups=n_resgroups, n_resblocks=n_resblocks, n_feats=n_feats,
        n_colors=n_colors, rgb_range=rgb_range, norm=norm, kernel_size=kernel_size,
        reduction=reduction, unshuffle_mod=unshuffle_mod,
    )
    meta = ModelMetadata(in_channels=n_colors, out_channels=n_colors, upscale=scale, name='RCAN')
    return SRModel('RCAN', cfg, dict(sd), meta, apply)


ARCH = Architecture(
    id='RCAN',
    detect_condition=KeyCondition.has_any(
        KeyCondition.has_all(
            'head.0.weight', 'tail.1.weight', 'body.0.body.0.body.0.weight',
            'body.0.body.0.body.3.conv_du.0.weight',
        ),
        KeyCondition.has_all(
            'head.1.weight', 'tail.1.weight', 'body.0.body.0.body.0.weight',
            'body.0.body.0.body.3.conv_du.0.weight',
        ),
    ),
    load_fn=_load,
)
