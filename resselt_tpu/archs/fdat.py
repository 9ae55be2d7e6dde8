"""FDAT — Fast Dual Aggregation Transformer.

Parity with resselt/archs/fdat/{__init__.py,arch.py}: alternating
spatial-window / channel attention blocks with per-window learned bias
tables, SimplifiedAIM interactions, depthwise-mixed FFN, UniUpsampleV3
tail (MetaUpsample v3 buffer).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.window import multi_head_attention
from ..nn.upsample import SAMPLE_MODS3, uni_upsample_v3
from ..nn.window import window_partition, window_reverse


@dataclass(frozen=True)
class FDATConfig:
    num_in_ch: int
    num_out_ch: int
    scale: int
    embed_dim: int
    num_groups: int
    depth: int  # blocks per group (= depth_per_group * len(pattern))
    num_heads: int
    window_size: int
    ffn_expansion_ratio: float
    aim_reduction_ratio: int
    mid_dim: int
    upsampler_type: str
    unshuffle_mod: bool


def _spatial_attn(p: PTree, x, nh: int, ws: int):
    """FastSpatialWindowAttention on NHWC (fdat/arch.py:443-494)."""
    b, h, w, c = x.shape
    pad_b = (ws - h % ws) % ws
    pad_r = (ws - w % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r
    windows = window_partition(x, ws)
    qkv = F.linear(windows, p['qkv.weight'], p.get('qkv.bias'))
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    n = ws * ws
    hd = c // nh
    # shared dispatch (nn/window.py): fused-kernel gate + >=128-window chunking
    out = multi_head_attention(q, k, v, nh, hd**-0.5, bias=p['bias'].astype(x.dtype))
    out = F.linear(out, p['proj.weight'], p.get('proj.bias'))
    out = window_reverse(out, ws, hp, wp)
    if pad_b or pad_r:
        out = out[:, :h, :w, :]
    return out


def _channel_attn(p: PTree, x, nh: int):
    """FastChannelAttention (fdat/arch.py:497-519): XCiT-style normalized
    channel attention over the full token sequence."""
    b, h, w, c = x.shape
    n = h * w
    xs = x.reshape(b, n, c)
    qkv = F.linear(xs, p['qkv.weight'], p.get('qkv.bias'))
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    hd = c // nh
    # (b, nh, hd, n): channels are tokens
    q = q.reshape(b, n, nh, hd).transpose(0, 2, 3, 1)
    k = k.reshape(b, n, nh, hd).transpose(0, 2, 3, 1)
    v = v.reshape(b, n, nh, hd).transpose(0, 2, 3, 1)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    temp = p['temp'].astype(x.dtype).reshape(1, nh, 1, 1)
    attn = jnp.einsum('bhdn,bhen->bhde', q, k, preferred_element_type=jnp.float32).astype(x.dtype) * temp
    attn = F.softmax(attn)
    out = jnp.einsum('bhde,bhen->bhdn', attn, v, preferred_element_type=jnp.float32).astype(x.dtype)
    # (b, n, nh*hd): torch permute(0, 3, 1, 2) puts n first then (nh, hd)
    out = out.transpose(0, 3, 1, 2).reshape(b, n, c)
    return F.linear(out, p['proj.weight'], p.get('proj.bias')).reshape(b, h, w, c)


def _block(p: PTree, x, cfg: FDATConfig, btype: str):
    """SimplifiedDATBlock (fdat/arch.py:574-602)."""
    dim = cfg.embed_dim
    n1 = F.layer_norm(x, p['n1.weight'], p['n1.bias'])
    if btype == 'spatial':
        attn_feat = _spatial_attn(p.sub('attn'), n1, cfg.num_heads, cfg.window_size)
    else:
        attn_feat = _channel_attn(p.sub('attn'), n1, cfg.num_heads)
    conv_feat = F.gelu(F.conv2d(n1, p['conv.0.weight'], padding=1, groups=dim))

    # SimplifiedAIM (fdat/arch.py:522-548)
    if btype == 'spatial':
        # channel_modulates_spatial
        cm = jnp.mean(conv_feat, axis=(1, 2), keepdims=True)
        cm = F.gelu(F.conv2d(cm, p['inter.cg.1.weight']))
        cm = F.sigmoid(F.conv2d(cm, p['inter.cg.3.weight']))
        fused = attn_feat * cm + conv_feat
    else:
        # spatial_modulates_channel
        sm = F.sigmoid(F.conv2d(attn_feat, p['inter.sg.0.weight']))
        fused = attn_feat + conv_feat * sm
    x = x + fused

    y = F.layer_norm(x, p['n2.weight'], p['n2.bias'])
    y = F.gelu(F.linear(y, p['ffn.fc1.weight']))
    hd = y.shape[-1]
    y = F.conv2d(y, p['ffn.smix.weight'], padding=1, groups=hd)
    y = F.linear(y, p['ffn.fc2.weight'])
    return x + y


def apply(cfg: FDATConfig, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    run_scale = cfg.scale
    if cfg.unshuffle_mod and cfg.scale < 3:
        unshuffle = 4 // cfg.scale
        x = F.pad_to_multiple(x, unshuffle, mode='reflect')
        x = F.pixel_unshuffle(x, unshuffle)
        shallow = p.conv('conv_first.1', x, padding=1)
        up_scale = 4
    else:
        shallow = p.conv('conv_first', x, padding=1)
        up_scale = cfg.scale

    deep = shallow
    pattern = ('spatial', 'channel')
    for gi in range(cfg.num_groups):
        gp = p.sub(f'groups.{gi}')
        y = deep
        for bi in range(cfg.depth):
            y = _block(gp.sub(f'blocks.{bi}'), y, cfg, pattern[bi % 2])
        deep = gp.conv('conv', y, padding=1) + deep
    deep = p.conv('conv_after', deep, padding=1)

    out = uni_upsample_v3(
        p.sub('upsampler'), deep + shallow, cfg.upsampler_type, up_scale,
        cfg.num_out_ch, cfg.mid_dim, group=4, dysample_end_kernel=1,
    )
    return out[:, : h0 * run_scale, : w0 * run_scale]


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/fdat/__init__.py:24-77)."""
    meta_buf = [int(i) for i in sd['upsampler.MetaUpsample'].reshape(-1)]
    _, upsampler_index, scale, embed_dim, num_out_ch, mid_dim, _ = meta_buf
    upsampler_type = SAMPLE_MODS3[upsampler_index]

    if 'conv_first.1.weight' in sd:
        num_in_ch = num_out_ch
        scale = 4 // math.isqrt(sd['conv_first.1.weight'].shape[1] // num_in_ch)
        unshuffle_mod = True
    else:
        unshuffle_mod = False
        num_in_ch = sd['conv_first.weight'].shape[1]

    num_groups = get_seq_len(sd, 'groups')
    depth = get_seq_len(sd, 'groups.0.blocks')
    num_heads = sd['groups.0.blocks.0.attn.bias'].shape[0]
    window_size = math.isqrt(sd['groups.0.blocks.0.attn.bias'].shape[2])
    ffn_expansion_ratio = float(sd['groups.0.blocks.0.ffn.fc1.weight'].shape[0] / embed_dim)
    aim_reduction_ratio = embed_dim // sd['groups.0.blocks.0.inter.cg.1.weight'].shape[0]

    cfg = FDATConfig(
        num_in_ch=num_in_ch, num_out_ch=num_out_ch, scale=scale, embed_dim=embed_dim,
        num_groups=num_groups, depth=depth, num_heads=num_heads, window_size=window_size,
        ffn_expansion_ratio=ffn_expansion_ratio, aim_reduction_ratio=aim_reduction_ratio,
        mid_dim=mid_dim, upsampler_type=upsampler_type, unshuffle_mod=unshuffle_mod,
    )
    params = {k: v for k, v in sd.items() if k != 'upsampler.MetaUpsample'}
    meta = ModelMetadata(in_channels=num_in_ch, out_channels=num_out_ch, upscale=scale, name='FDAT')
    model = SRModel('FDAT', cfg, params, meta, apply)
    # measured on v5e (sweep_tiled.json fdat rows + standalone re-runs,
    # 720p): bf16 ties ~11.3 MP/s across t128/160/192 at b2; f32 is best
    # at t128 (tunnel-noisy cells re-measured twice).  t128 b2 is the
    # safe joint pick.
    model.tile_batch = 2
    model.serving_tile = 128
    # halo 8 at seam parity (76.0 dB at every halo): 19.7 vs 13.6 f32 /
    # 21.6 vs 15.0 bf16 MP/s at 720p (sweep_halo.json) — the largest halo
    # win in the suite (+45%)
    model.serving_halo = 8
    # unshuffle stems see (H/unshuffle, W/unshuffle): input windows must be
    # multiples of window_size * unshuffle for re-pad-free tiling
    unshuffle = 4 // scale if (unshuffle_mod and scale < 3) else 1
    model.size_multiple = window_size * unshuffle
    return model


ARCH = Architecture(
    id='FDAT',
    detect_condition=KeyCondition.has_all(
        'groups.0.blocks.0.attn.bias',
        'groups.0.blocks.0.inter.cg.1.weight',
        'groups.0.blocks.0.ffn.fc1.weight',
        'groups.0.blocks.0.n1.weight',
        'upsampler.MetaUpsample',
    ),
    load_fn=_load,
)
