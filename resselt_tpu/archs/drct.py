"""DRCT — Dense Residual Connected Transformer.

Parity with resselt/archs/drct/{__init__.py,arch.py}: RDG dense groups of 5
Swin blocks with growth-channel (gc) adjust convs (arch.py:204-336); swin
blocks reuse the shared swin_block (identical structure to SwinIR's).
Note the reference loader class is misnamed ``MoSRArch`` (drct/__init__.py:9).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_pixelshuffle_params, get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from .swinir import swin_block

_RGB_MEAN = (0.4488, 0.4371, 0.4040)


@dataclass(frozen=True)
class DRCTConfig:
    in_chans: int
    embed_dim: int
    num_layers: int
    num_heads: tuple[int, ...]
    window_size: int
    gc: int
    upscale: int
    img_range: float
    upsampler: str
    resi_connection: str
    img_size: int


def _rdg(p: PTree, x, cfg: DRCTConfig, heads: int):
    """RDG (drct/arch.py:325-336)."""
    res = (cfg.img_size, cfg.img_size)
    ws = cfg.window_size
    d, gc = cfg.embed_dim, cfg.gc

    def heads_for(width):
        return heads - (width % heads)

    def adjust(name, t, act=True):
        t = p.conv(name, t)
        return F.leaky_relu(t, 0.2) if act else t

    x1 = adjust('adjust1', swin_block(p.sub('swin1'), x, heads, ws, 0, res))
    x2 = adjust('adjust2', swin_block(p.sub('swin2'), jnp.concatenate([x, x1], -1), heads_for(d + gc), ws, ws // 2, res))
    x3 = adjust('adjust3', swin_block(p.sub('swin3'), jnp.concatenate([x, x1, x2], -1), heads_for(d + 2 * gc), ws, 0, res))
    x4 = adjust('adjust4', swin_block(p.sub('swin4'), jnp.concatenate([x, x1, x2, x3], -1), heads_for(d + 3 * gc), ws, ws // 2, res))
    x5 = adjust('adjust5', swin_block(p.sub('swin5'), jnp.concatenate([x, x1, x2, x3, x4], -1), heads_for(d + 4 * gc), ws, 0, res), act=False)
    return x5 * 0.2 + x


def apply(cfg: DRCTConfig, params, x):
    p = PTree(params)
    if cfg.in_chans == 3:
        mean = jnp.asarray(_RGB_MEAN, x.dtype)
    else:
        mean = jnp.zeros((1,), x.dtype)
    x = (x - mean) * cfg.img_range
    h0, w0 = x.shape[1], x.shape[2]
    x = F.pad_to_multiple(x, cfg.window_size, mode='reflect')

    if cfg.upsampler == 'pixelshuffle':
        x = p.conv('conv_first', x, padding=1)
        feat = x
        if 'patch_embed.norm.weight' in params:
            feat = F.layer_norm(feat, p['patch_embed.norm.weight'], p['patch_embed.norm.bias'])
        for li in range(cfg.num_layers):
            feat = _rdg(p.sub(f'layers.{li}'), feat, cfg, cfg.num_heads[li])
        feat = F.layer_norm(feat, p['norm.weight'], p['norm.bias'])
        if cfg.resi_connection == '1conv':
            feat = p.conv('conv_after_body', feat, padding=1)
        x = feat + x
        x = F.leaky_relu(p.conv('conv_before_upsample.0', x, padding=1), 0.01)
        if cfg.upscale & (cfg.upscale - 1) == 0:
            for i in range(int(math.log2(cfg.upscale))):
                x = F.pixel_shuffle(p.conv(f'upsample.{2 * i}', x, padding=1), 2)
        elif cfg.upscale == 3:
            x = F.pixel_shuffle(p.conv('upsample.0', x, padding=1), 3)
        x = p.conv('conv_last', x, padding=1)

    x = x / cfg.img_range + mean
    return x[:, : h0 * cfg.upscale, : w0 * cfg.upscale]


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/drct/__init__.py:42-104)."""
    in_chans = sd['conv_first.weight'].shape[1]
    embed_dim = sd['conv_first.weight'].shape[0]
    num_layers = get_seq_len(sd, 'layers')
    num_heads = tuple(
        sd[f'layers.{i}.swin1.attn.relative_position_bias_table'].shape[1] for i in range(num_layers)
    )
    window_square = sd['layers.0.swin1.attn.relative_position_bias_table'].shape[0]
    window_size = (math.isqrt(window_square) + 1) // 2

    if 'conv_last.weight' in sd:
        upsampler = 'pixelshuffle'
        upscale, _ = get_pixelshuffle_params(sd, 'upsample')
    else:
        upsampler = ''
        upscale = 1

    resi_connection = '1conv' if 'conv_after_body.weight' in sd else 'identity'
    gc = sd['layers.0.adjust1.weight'].shape[0]

    if 'layers.0.swin2.attn_mask' in sd:
        img_size = math.isqrt(sd['layers.0.swin2.attn_mask'].shape[0]) * window_size
    else:
        img_size = window_size

    cfg = DRCTConfig(
        in_chans=in_chans, embed_dim=embed_dim, num_layers=num_layers, num_heads=num_heads,
        window_size=window_size, gc=gc, upscale=upscale, img_range=1.0,
        upsampler=upsampler, resi_connection=resi_connection, img_size=img_size,
    )
    params = {k: v for k, v in sd.items() if not k.endswith('.attn_mask')}
    meta = ModelMetadata(in_channels=in_chans, out_channels=in_chans, upscale=upscale, name='DRCT')
    model = SRModel('DRCT', cfg, params, meta, apply)
    # measured on v5e (sweep_tiled.json drct rows, 720p end-to-end):
    # t128 b1 wins both dtypes (4.43 f32 / 6.80 bf16 MP/s); t160/t192
    # and b2 all lose
    model.tile_batch = 1
    # r5 small-tile re-visit at tuned halos (probe_tile_revisit.json +
    # probe_tile_confirm.json): f32 keeps rising as tiles shrink — t96
    # 8.16 vs t128 6.70 MP/s (+22%, reproduced; t80 ties t96, so the
    # largest tile on the plateau wins) with seam 48.3 dB ~= t128's 49.5.
    # bf16 stays t128 (10.57 vs 9.36 at t96).
    model.serving_tile = {'f32': 96, 'bf16': 128}
    # halo 8 at identical seam PSNR (49.53 dB at h8/h16/h24): 6.69 vs 5.27
    # f32 / 10.55 vs 8.29 bf16 MP/s at 720p (sweep_halo.json)
    model.serving_halo = 8
    model.size_multiple = window_size
    return model


ARCH = Architecture(
    id='DRCT',
    detect_condition=KeyCondition.has_all(
        'conv_first.weight',
        'conv_first.bias',
        'layers.0.swin1.norm1.weight',
        'layers.0.swin1.norm1.bias',
        'layers.0.swin1.attn.relative_position_bias_table',
        'layers.0.swin1.attn.relative_position_index',
        'layers.0.swin1.attn.qkv.weight',
        'layers.0.swin1.attn.proj.weight',
        'layers.0.swin1.attn.proj.bias',
        'layers.0.swin1.norm2.weight',
        'layers.0.swin1.mlp.fc1.weight',
        'layers.0.swin1.mlp.fc1.bias',
        'layers.0.swin1.mlp.fc2.weight',
        'layers.0.adjust1.weight',
        'layers.0.swin2.norm1.weight',
        'layers.0.adjust2.weight',
        'layers.0.swin3.norm1.weight',
        'layers.0.adjust3.weight',
        'layers.0.swin4.norm1.weight',
        'layers.0.adjust4.weight',
        'layers.0.swin5.norm1.weight',
        'layers.0.adjust5.weight',
        'norm.weight',
        'norm.bias',
    ),
    load_fn=_load,
)
