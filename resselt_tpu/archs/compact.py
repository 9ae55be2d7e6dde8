"""Compact (SRVGGNetCompact) — plain conv/PReLU stack with pixel-shuffle
tail and nearest-upsampled residual base.

Parity with resselt/archs/compact/{__init__.py,arch.py}.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len, pixelshuffle_scale
from ..nn import functional as F
from ..nn.params import PTree


@dataclass(frozen=True)
class CompactConfig:
    num_in_ch: int
    num_out_ch: int
    num_feat: int
    num_conv: int
    upscale: int


def apply(cfg: CompactConfig, params, x):
    p = PTree(params)
    out = x
    # body = [conv, prelu] * (num_conv + 1) + [conv]  (compact/arch.py:37-56)
    n_layers = 2 * (cfg.num_conv + 1) + 1
    for i in range(n_layers):
        if i % 2 == 0:
            out = p.conv(f'body.{i}', out, padding=1)
        else:
            out = F.prelu(out, p[f'body.{i}.weight'])
    out = F.pixel_shuffle(out, cfg.upscale)
    base = F.interpolate_nearest(x, scale_factor=cfg.upscale)
    return out + base


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/compact/__init__.py:18-37)."""
    highest_num = get_seq_len(sd, 'body') - 1
    in_nc = sd['body.0.weight'].shape[1]
    num_feat = sd['body.0.weight'].shape[0]
    num_conv = (highest_num - 2) // 2
    pixelshuffle_shape = sd[f'body.{highest_num}.bias'].shape[0]
    scale = pixelshuffle_scale(pixelshuffle_shape, in_nc)

    cfg = CompactConfig(num_in_ch=in_nc, num_out_ch=in_nc, num_feat=num_feat, num_conv=num_conv, upscale=scale)
    meta = ModelMetadata(in_channels=in_nc, out_channels=in_nc, upscale=scale, name='Compact')
    model = SRModel('Compact', cfg, dict(sd), meta, apply)
    # halo 4 at seam parity (105.5 dB, sweep_halo.json): 193.6 vs 164.7
    # f32 / 253.1 vs 216.6 bf16 MP/s tiled 720p t256
    model.serving_halo = 4
    return model


ARCH = Architecture(
    id='Compact',
    detect_condition=KeyCondition.has_all('body.0.weight', 'body.1.weight'),
    load_fn=_load,
)
