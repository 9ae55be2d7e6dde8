"""SPAN — Swift Parameter-free Attention Network.

Parity with resselt/archs/span/{__init__.py,arch.py}.  Conv3XC collapsed at
load (the reference recomputes per forward, span/arch.py:152-154).  Note the
reference normalizes the input ``(x - mean) * img_range`` but never
un-normalizes the output (span/arch.py:231-248) — replicated as-is.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import pixelshuffle_scale
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.upsample import conv_pixel_shuffle
from .spanplus import transform_params

_RGB_MEAN = (0.4488, 0.4371, 0.4040)


@dataclass(frozen=True)
class SpanConfig:
    num_in_ch: int
    num_out_ch: int
    feature_channels: int
    upscale: int
    norm: bool
    img_range: float = 255.0


def _spab(p: PTree, x):
    """SPAB with inplace SiLU (span/arch.py:157-180): the second return
    value is the activated out1 because ``nn.SiLU(inplace=True)`` mutates it."""
    out1_act = F.silu(p.conv('c1_r.eval_conv', x, padding=1))
    out2 = p.conv('c2_r.eval_conv', out1_act, padding=1)
    out3 = p.conv('c3_r.eval_conv', F.silu(out2), padding=1)
    sim_att = F.sigmoid(out3) - 0.5
    return (out3 + x) * sim_att, out1_act


def apply(cfg: SpanConfig, params, x):
    p = PTree(params)
    if cfg.norm:
        mean = jnp.asarray(_RGB_MEAN, x.dtype)
        x = (x - mean) * cfg.img_range

    feat = p.conv('conv_1.eval_conv', x, padding=1)
    out_b1, _ = _spab(p.sub('block_1'), feat)
    out_b2, _ = _spab(p.sub('block_2'), out_b1)
    out_b3, _ = _spab(p.sub('block_3'), out_b2)
    out_b4, _ = _spab(p.sub('block_4'), out_b3)
    out_b5, _ = _spab(p.sub('block_5'), out_b4)
    out_b6, out_b5_2 = _spab(p.sub('block_6'), out_b5)

    out_b6 = p.conv('conv_2.eval_conv', out_b6, padding=1)
    out = p.conv('conv_cat', jnp.concatenate([feat, out_b6, out_b1, out_b5_2], axis=-1))
    return conv_pixel_shuffle(p, out, 'upsampler.0', cfg.upscale, padding=1)


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/span/__init__.py:26-55)."""
    num_in_ch = sd['conv_1.sk.weight'].shape[1]
    feature_channels = sd['conv_1.sk.weight'].shape[0]
    num_out_ch = num_in_ch
    upscale = pixelshuffle_scale(sd['upsampler.0.weight'].shape[0], num_in_ch)
    norm = 'no_norm' not in sd

    cfg = SpanConfig(
        num_in_ch=num_in_ch,
        num_out_ch=num_out_ch,
        feature_channels=feature_channels,
        upscale=upscale,
        norm=norm,
    )
    params = {k: v for k, v in transform_params(sd).items() if k != 'no_norm'}
    meta = ModelMetadata(in_channels=num_in_ch, out_channels=num_out_ch, upscale=upscale, name='SPAN')
    model = SRModel('SPAN', cfg, params, meta, apply)
    # halo 4 seams at 62.7 dB (invisible): 243 vs 221 f32 / 342 vs 294
    # bf16 MP/s tiled 720p t256 (sweep_halo.json)
    model.serving_halo = 4
    return model


ARCH = Architecture(
    id='SPAN',
    detect_condition=KeyCondition.has_all(
        'conv_1.sk.weight',
        'block_1.c1_r.sk.weight',
        'block_1.c1_r.eval_conv.weight',
        'block_1.c3_r.eval_conv.weight',
        'conv_cat.weight',
        'conv_2.sk.weight',
        'conv_2.eval_conv.weight',
        'upsampler.0.weight',
    ),
    load_fn=_load,
)
