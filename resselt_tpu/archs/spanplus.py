"""SPANPlus — Swift Parameter-free Attention Network, plus variant.

JAX NHWC re-implementation with behavior parity to
resselt/archs/spanplus/{__init__.py,arch.py}.  All Conv3XC bundles are
collapsed to single 3x3 convs at load time (the reference recomputes them
on every forward, arch.py:97-100).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import dysample_scale, get_seq_len, pixelshuffle_scale
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.reparam import conv3xc_collapse
from ..nn.upsample import conv_pixel_shuffle, dysample


@dataclass(frozen=True)
class SpanPlusConfig:
    num_in_ch: int
    num_out_ch: int
    blocks: tuple[int, ...]
    feature_channels: int
    upscale: int
    upsampler: str  # 'ps' | 'dys' | 'conv'


def _spab(p: PTree, x):
    """SPAB block (reference arch.py:105-131). Returns (out, out1).

    Note: the reference's ``nn.Mish(inplace=True)`` mutates ``out1`` before
    it is returned, so the second output is the *activated* out1."""
    out1_act = F.mish(p.conv('c1_r.eval_conv', x, padding=1))
    out2 = p.conv('c2_r.eval_conv', out1_act, padding=1)
    out3 = p.conv('c3_r.eval_conv', F.mish(out2), padding=1)
    sim_att = F.sigmoid(out3) - 0.5
    return (out3 + x) * sim_att, out1_act


def _spabs(p: PTree, x, n_blocks: int):
    """SPABS group (reference arch.py:133-151)."""
    out_b1, _ = _spab(p.sub('block_1'), x)
    out_x = out_b1
    for i in range(n_blocks):
        out_x, _ = _spab(p.sub(f'block_n.{i}'), out_x)
    out_end, out_x_2 = _spab(p.sub('block_end'), out_x)
    out_end = p.conv('conv_2.eval_conv', out_end, padding=1)
    cat = jnp.concatenate([x, out_end, out_b1, out_x_2], axis=-1)
    return p.conv('conv_cat', cat)


def apply(cfg: SpanPlusConfig, params, x):
    p = PTree(params)
    out = p.conv('feats.0.eval_conv', x, padding=1)
    for i, n_blocks in enumerate(cfg.blocks):
        out = _spabs(p.sub(f'feats.{i + 1}'), out, n_blocks)
    if cfg.upsampler == 'ps':
        return conv_pixel_shuffle(p, out, 'upsampler.0', cfg.upscale, padding=1)
    if cfg.upsampler == 'dys':
        return dysample(p.sub('upsampler'), out, cfg.upscale)
    return p.conv('upsampler', out, padding=1)


def transform_params(sd) -> dict:
    """Collapse every Conv3XC; keep only runtime keys."""
    out = {}
    prefixes = sorted({k.rsplit('.', 2)[0] for k in sd if k.endswith('.sk.weight')})
    collapsed = set()
    for prefix in prefixes:
        w, b = conv3xc_collapse(sd, prefix)
        out[f'{prefix}.eval_conv.weight'] = w
        out[f'{prefix}.eval_conv.bias'] = b
        collapsed.add(prefix)
    for k, v in sd.items():
        root = k.rsplit('.', 2)[0]
        if root in collapsed or any(k.startswith(c + '.') for c in collapsed):
            continue
        out[k] = v
    return out


def _load(sd) -> SRModel:
    """Config inference (reference: resselt/archs/spanplus/__init__.py:15-38)."""
    n_feats = get_seq_len(sd, 'feats') - 1
    blocks = tuple(get_seq_len(sd, f'feats.{i + 1}.block_n') for i in range(n_feats))
    num_in_ch = sd['feats.0.eval_conv.weight'].shape[1]
    feature_channels = sd['feats.0.eval_conv.weight'].shape[0]
    if 'upsampler.0.weight' in sd:
        upsampler = 'ps'
        num_out_ch = num_in_ch
        upscale = pixelshuffle_scale(sd['upsampler.0.weight'].shape[0], num_out_ch)
    elif 'upsampler.offset.weight' in sd:
        upsampler = 'dys'
        num_out_ch = sd['upsampler.end_conv.weight'].shape[0]
        upscale = dysample_scale(sd['upsampler.offset.weight'].shape[0])
    else:
        upsampler = 'conv'
        num_out_ch = sd['upsampler.weight'].shape[0]
        upscale = 1

    cfg = SpanPlusConfig(
        num_in_ch=num_in_ch,
        num_out_ch=num_out_ch,
        blocks=blocks,
        feature_channels=feature_channels,
        upscale=upscale,
        upsampler=upsampler,
    )
    params = transform_params(sd)
    meta = ModelMetadata(in_channels=num_in_ch, out_channels=num_out_ch, upscale=upscale, name='SPANPlus')
    return SRModel('spanplus', cfg, params, meta, apply)


ARCH = Architecture(
    id='spanplus',
    detect_condition=KeyCondition.has_all('feats.0.eval_conv.weight'),
    load_fn=_load,
)
