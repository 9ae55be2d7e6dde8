"""DAT — Dual Aggregation Transformer.

Parity with resselt/archs/dat/{__init__.py,arch.py}: alternating adaptive
spatial (dual rectangular-window branches with dynamic position bias MLP)
and adaptive channel (XCiT-style) attention with AIM interactions, SGFN
feed-forward, internal per-attention padding, alternating shifts by
(rg_idx, b_idx) parity (arch.py:455-490).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len, pixelshuffle_scale
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.window import multi_head_attention, rect_attn_mask

_RGB_MEAN = (0.4488, 0.4371, 0.4040)


@dataclass(frozen=True)
class DATConfig:
    in_chans: int
    embed_dim: int
    depth: tuple[int, ...]
    num_heads: tuple[int, ...]
    split_size: tuple[int, int]
    expansion_factor: float
    qkv_bias: bool
    upscale: int
    img_range: float
    resi_connection: str
    upsampler: str
    img_size: int


def _dyn_pos_bias(p: PTree, biases, num_heads: int):
    """DynamicPosBias, residual=False (dat/arch.py:104-143)."""
    pos = F.linear(biases, p['pos_proj.weight'], p.get('pos_proj.bias'))

    def seq(name, t):
        t = F.layer_norm(t, p[f'{name}.0.weight'], p[f'{name}.0.bias'])
        t = F.relu(t)
        return F.linear(t, p[f'{name}.2.weight'], p.get(f'{name}.2.bias'))

    pos = seq('pos1', pos)
    pos = seq('pos2', pos)
    return seq('pos3', pos)


def _img2windows(x, hsp: int, wsp: int):
    """(B, H, W, C) -> (B*nW, hsp*wsp, C) (dat/arch.py:17-25)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // hsp, hsp, w // wsp, wsp, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, hsp * wsp, c)


def _windows2img(xw, hsp: int, wsp: int, h: int, w: int):
    c = xw.shape[-1]
    b = xw.shape[0] // ((h // hsp) * (w // wsp))
    x = xw.reshape(b, h // hsp, w // wsp, hsp, wsp, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _spatial_branch(p: PTree, q, k, v, hsp: int, wsp: int, heads: int, mask):
    """Spatial_Attention branch (dat/arch.py:146-270); q/k/v: (B, H, W, Cb)."""
    b, h, w, c = q.shape
    hd = c // heads
    scale = hd**-0.5
    n = hsp * wsp

    qw = _img2windows(q, hsp, wsp)
    kw = _img2windows(k, hsp, wsp)
    vw = _img2windows(v, hsp, wsp)

    pos = _dyn_pos_bias(p.sub('pos'), p['rpe_biases'].astype(q.dtype), heads)
    rpi = p['relative_position_index'].reshape(-1)
    bias = pos[rpi].reshape(n, n, heads).transpose(2, 0, 1).astype(q.dtype)

    mask_j = None if mask is None else jnp.asarray(mask, q.dtype)
    out = multi_head_attention(qw, kw, vw, heads, scale, bias=bias, mask=mask_j)
    return _windows2img(out, hsp, wsp, h, w)


def _adaptive_spatial_attn(p: PTree, x, cfg: DATConfig, heads: int, shifted: bool):
    """Adaptive_Spatial_Attention (dat/arch.py:270-515); x: (B, H, W, C)."""
    b, h, w, c = x.shape
    sp0, sp1 = cfg.split_size
    sh0, sh1 = sp0 // 2, sp1 // 2

    qkv = F.linear(x, p['qkv.weight'], p.get('qkv.bias'))
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    v_img = v  # unpadded v for the conv branch

    msp = max(sp0, sp1)
    pad_b = (msp - h % msp) % msp
    pad_r = (msp - w % msp) % msp
    if pad_b or pad_r:
        pads = ((0, 0), (0, pad_b), (0, pad_r), (0, 0))
        q, k, v = (jnp.pad(t, pads) for t in (q, k, v))
    hp, wp = h + pad_b, w + pad_r

    half = c // 2
    bh = heads // 2
    if shifted:
        def roll(t, s):
            return jnp.roll(t, shift=s, axis=(1, 2))

        q0, k0, v0 = (roll(t[..., :half], (-sh0, -sh1)) for t in (q, k, v))
        q1, k1, v1 = (roll(t[..., half:], (-sh1, -sh0)) for t in (q, k, v))
        m0 = rect_attn_mask(hp, wp, sp0, sp1, sh0, sh1)
        m1 = rect_attn_mask(hp, wp, sp1, sp0, sh1, sh0)
        x0 = _spatial_branch(p.sub('attns.0'), q0, k0, v0, sp0, sp1, bh, m0)
        x1 = _spatial_branch(p.sub('attns.1'), q1, k1, v1, sp1, sp0, bh, m1)
        x0 = jnp.roll(x0, shift=(sh0, sh1), axis=(1, 2))[:, :h, :w, :]
        x1 = jnp.roll(x1, shift=(sh1, sh0), axis=(1, 2))[:, :h, :w, :]
    else:
        x0 = _spatial_branch(p.sub('attns.0'), q[..., :half], k[..., :half], v[..., :half], sp0, sp1, bh, None)[:, :h, :w, :]
        x1 = _spatial_branch(p.sub('attns.1'), q[..., half:], k[..., half:], v[..., half:], sp1, sp0, bh, None)[:, :h, :w, :]
    attened = jnp.concatenate([x0, x1], axis=-1)

    # conv branch on v
    conv_x = p.conv('dwconv.0', v_img, padding=1, groups=c)
    conv_x = F.gelu(p.batch_norm('dwconv.1', conv_x))

    # AIM
    cm = jnp.mean(conv_x, axis=(1, 2), keepdims=True)
    cm = p.conv('channel_interaction.1', cm)
    cm = F.gelu(p.batch_norm('channel_interaction.2', cm))
    cm = p.conv('channel_interaction.4', cm)

    sm = p.conv('spatial_interaction.0', attened)
    sm = F.gelu(p.batch_norm('spatial_interaction.1', sm))
    sm = p.conv('spatial_interaction.3', sm)

    attened = attened * F.sigmoid(cm)
    conv_x = F.sigmoid(sm) * conv_x
    out = attened + conv_x
    return F.linear(out, p['proj.weight'], p.get('proj.bias'))


def _adaptive_channel_attn(p: PTree, x, heads: int):
    """Adaptive_Channel_Attention (dat/arch.py:516-615); x: (B, H, W, C)."""
    b, h, w, c = x.shape
    n = h * w
    xs = x.reshape(b, n, c)
    qkv = F.linear(xs, p['qkv.weight'], p.get('qkv.bias'))
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    hd = c // heads
    # transpose(-2, -1): tokens are channels
    q = q.reshape(b, n, heads, hd).transpose(0, 2, 3, 1)
    k = k.reshape(b, n, heads, hd).transpose(0, 2, 3, 1)
    vt = v.reshape(b, n, heads, hd).transpose(0, 2, 3, 1)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    temp = p['temperature'].astype(x.dtype).reshape(1, heads, 1, 1)
    attn = jnp.einsum('bhdn,bhen->bhde', q, k, preferred_element_type=jnp.float32).astype(x.dtype) * temp
    attn = F.softmax(attn)
    attened = jnp.einsum('bhde,bhen->bhdn', attn, vt, preferred_element_type=jnp.float32).astype(x.dtype)
    attened = attened.transpose(0, 3, 1, 2).reshape(b, n, c)

    v_img = v.reshape(b, h, w, c)
    conv_x = p.conv('dwconv.0', v_img, padding=1, groups=c)
    conv_x = F.gelu(p.batch_norm('dwconv.1', conv_x))

    attened_img = attened.reshape(b, h, w, c)
    cm = jnp.mean(attened_img, axis=(1, 2), keepdims=True)
    cm = p.conv('channel_interaction.1', cm)
    cm = F.gelu(p.batch_norm('channel_interaction.2', cm))
    cm = p.conv('channel_interaction.4', cm)

    sm = p.conv('spatial_interaction.0', conv_x)
    sm = F.gelu(p.batch_norm('spatial_interaction.1', sm))
    sm = p.conv('spatial_interaction.3', sm)

    attened_img = attened_img * F.sigmoid(sm)
    conv_x = conv_x * F.sigmoid(cm)
    out = attened_img + conv_x
    return F.linear(out, p['proj.weight'], p.get('proj.bias'))


def _sgfn(p: PTree, x, hidden: int):
    """SGFN (dat/arch.py:60-103); x: (B, H, W, C)."""
    x = F.gelu(p.linear('fc1', x))
    x1, x2 = x[..., : hidden // 2], x[..., hidden // 2 :]
    x2 = F.layer_norm(x2, p['sg.norm.weight'], p['sg.norm.bias'])
    x2 = p.conv('sg.conv', x2, padding=1, groups=hidden // 2)
    return p.linear('fc2', x1 * x2)


def _datb(p: PTree, x, cfg: DATConfig, heads: int, rg_idx: int, b_idx: int):
    """DATB (dat/arch.py:615-680)."""
    y = F.layer_norm(x, p['norm1.weight'], p['norm1.bias'])
    if b_idx % 2 == 0:
        shifted = (rg_idx % 2 == 0 and b_idx > 0 and (b_idx - 2) % 4 == 0) or (
            rg_idx % 2 != 0 and b_idx % 4 == 0
        )
        y = _adaptive_spatial_attn(p.sub('attn'), y, cfg, heads, shifted)
    else:
        y = _adaptive_channel_attn(p.sub('attn'), y, heads)
    x = x + y
    y = F.layer_norm(x, p['norm2.weight'], p['norm2.bias'])
    x = x + _sgfn(p.sub('ffn'), y, int(cfg.embed_dim * cfg.expansion_factor))
    return x


def _resi_conv(p: PTree, key: str, x, resi_connection: str):
    if resi_connection == '1conv':
        return p.conv(key, x, padding=1)
    q = p.sub(key)
    x = F.leaky_relu(q.conv('0', x, padding=1), 0.2)
    x = F.leaky_relu(q.conv('2', x), 0.2)
    return q.conv('4', x, padding=1)


def apply(cfg: DATConfig, params, x):
    p = PTree(params)
    if cfg.in_chans == 3:
        mean = jnp.asarray(_RGB_MEAN, x.dtype)
    else:
        mean = jnp.zeros((1,), x.dtype)
    x = (x - mean) * cfg.img_range

    x = p.conv('conv_first', x, padding=1)
    feat = F.layer_norm(x, p['before_RG.1.weight'], p['before_RG.1.bias'])
    for gi, depth in enumerate(cfg.depth):
        gp = p.sub(f'layers.{gi}')
        y = feat
        for bi in range(depth):
            y = _datb(gp.sub(f'blocks.{bi}'), y, cfg, cfg.num_heads[gi], gi, bi)
        feat = feat + _resi_conv(gp, 'conv', y, cfg.resi_connection)
    feat = F.layer_norm(feat, p['norm.weight'], p['norm.bias'])
    x = _resi_conv(p, 'conv_after_body', feat, cfg.resi_connection) + x

    if cfg.upsampler == 'pixelshuffle':
        x = F.leaky_relu(p.conv('conv_before_upsample.0', x, padding=1), 0.01)
        if cfg.upscale & (cfg.upscale - 1) == 0:
            for i in range(int(math.log2(cfg.upscale))):
                x = F.pixel_shuffle(p.conv(f'upsample.{2 * i}', x, padding=1), 2)
        elif cfg.upscale == 3:
            x = F.pixel_shuffle(p.conv('upsample.0', x, padding=1), 3)
        x = p.conv('conv_last', x, padding=1)
    else:
        x = F.pixel_shuffle(p.conv('upsample.0', x, padding=1), cfg.upscale)

    return x / cfg.img_range + mean


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/dat/__init__.py:42-104)."""
    img_size = 64
    split_size = (2, 4)
    in_chans = sd['conv_first.weight'].shape[1]
    embed_dim = sd['conv_first.weight'].shape[0]

    num_layers = get_seq_len(sd, 'layers')
    depth = tuple(get_seq_len(sd, f'layers.{i}.blocks') for i in range(num_layers))
    num_heads = []
    for i in range(num_layers):
        if depth[i] >= 2:
            num_heads.append(sd[f'layers.{i}.blocks.1.attn.temperature'].shape[0])
        else:
            num_heads.append(sd[f'layers.{i}.blocks.0.attn.attns.0.pos.pos3.2.weight'].shape[0] * 2)

    upsampler = 'pixelshuffle' if 'conv_last.weight' in sd else 'pixelshuffledirect'
    resi_connection = '1conv' if 'conv_after_body.weight' in sd else '3conv'

    if upsampler == 'pixelshuffle':
        upscale = 1
        for i in range(0, get_seq_len(sd, 'upsample'), 2):
            num_feat = sd[f'upsample.{i}.weight'].shape[1]
            upscale *= int(math.sqrt(sd[f'upsample.{i}.weight'].shape[0] // num_feat))
    else:
        upscale = pixelshuffle_scale(sd['upsample.0.weight'].shape[0], in_chans)

    qkv_bias = 'layers.0.blocks.0.attn.qkv.bias' in sd
    expansion_factor = float(sd['layers.0.blocks.0.ffn.fc1.weight'].shape[0] / embed_dim)

    if 'layers.0.blocks.2.attn.attn_mask_0' in sd:
        m0x, m0y, _ = sd['layers.0.blocks.2.attn.attn_mask_0'].shape
        img_size = int(math.sqrt(m0x * m0y))
    if 'layers.0.blocks.0.attn.attns.0.rpe_biases' in sd:
        split_sizes = sd['layers.0.blocks.0.attn.attns.0.rpe_biases'][-1] + 1
        split_size = tuple(int(v) for v in split_sizes)

    cfg = DATConfig(
        in_chans=in_chans, embed_dim=embed_dim, depth=depth, num_heads=tuple(num_heads),
        split_size=split_size, expansion_factor=expansion_factor, qkv_bias=qkv_bias,
        upscale=upscale, img_range=1.0, resi_connection=resi_connection,
        upsampler=upsampler, img_size=img_size,
    )
    params = {k: v for k, v in sd.items() if '.attn_mask_' not in k}
    meta = ModelMetadata(in_channels=in_chans, out_channels=in_chans, upscale=upscale, name='DAT')
    model = SRModel('dat', cfg, params, meta, apply)
    # measured on v5e (sweep_tiled.json, 720p t128): f32 peaks at batch 4
    # (2.55 vs 2.30 at b8); bf16 peaks at batch 8 (3.44), where the stacked
    # window count crosses the fused-attention gate (ops/window_attention)
    model.tile_batch = {'f32': 4, 'bf16': 8}
    # r5 small-tile re-visit (probe_tile_revisit/confirm.json): bf16
    # prefers t96 (5.76 vs 5.33 at t128, +8%, reproduced; seam 69.6 dB
    # == t128's 69.7); f32 keeps t128 (4.14 vs 3.36 at t96).
    model.serving_tile = {'f32': 128, 'bf16': 96}
    # halo 8 at seam parity (69.72 dB vs 69.67 at h16): 4.14 vs 3.11 f32 /
    # 5.33 vs 4.13 bf16 MP/s at 720p (sweep_halo.json) — the 144^2 padded
    # window does 23% less work than h16's 160^2
    model.serving_halo = 8
    model.size_multiple = max(split_size)  # per-attention pad granule
    return model


ARCH = Architecture(
    id='dat',
    detect_condition=KeyCondition.has_all(
        'conv_first.weight',
        'before_RG.1.weight',
        'before_RG.1.bias',
        'layers.0.blocks.0.norm1.weight',
        'layers.0.blocks.0.norm2.weight',
        'layers.0.blocks.0.ffn.fc1.weight',
        'layers.0.blocks.0.ffn.sg.norm.weight',
        'layers.0.blocks.0.ffn.sg.conv.weight',
        'layers.0.blocks.0.ffn.fc2.weight',
        'layers.0.blocks.0.attn.qkv.weight',
        'layers.0.blocks.0.attn.proj.weight',
        'layers.0.blocks.0.attn.dwconv.0.weight',
        'layers.0.blocks.0.attn.dwconv.1.running_mean',
        'layers.0.blocks.0.attn.channel_interaction.1.weight',
        'layers.0.blocks.0.attn.channel_interaction.2.running_mean',
        'layers.0.blocks.0.attn.channel_interaction.4.weight',
        'layers.0.blocks.0.attn.spatial_interaction.0.weight',
        'layers.0.blocks.0.attn.spatial_interaction.1.running_mean',
        'layers.0.blocks.0.attn.spatial_interaction.3.weight',
        'layers.0.blocks.0.attn.attns.0.rpe_biases',
        'layers.0.blocks.0.attn.attns.0.relative_position_index',
        'layers.0.blocks.0.attn.attns.0.pos.pos_proj.weight',
        'layers.0.blocks.0.attn.attns.0.pos.pos1.0.weight',
        'layers.0.blocks.0.attn.attns.0.pos.pos3.0.weight',
        'norm.weight',
    ),
    load_fn=_load,
)
