"""RGT — Recursive Generalization Transformer.

Parity with resselt/archs/rgt/{__init__.py,arch.py}: L_SA dual
rectangular-window attention (shared with DAT) alternating with RG_SA
recursive-downsampled global cross-attention, HAI layer-scale residual,
gated MLP, pixelshuffle tail.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_pixelshuffle_params, get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.window import rect_attn_mask
from .dat import _sgfn, _spatial_branch

_RGB_MEAN = (0.4488, 0.4371, 0.4040)


@dataclass(frozen=True)
class RGTConfig:
    in_chans: int
    embed_dim: int
    depth: tuple[int, ...]
    num_heads: tuple[int, ...]
    mlp_ratio: float
    qkv_bias: bool
    upscale: int
    img_range: float
    resi_connection: str
    split_size: tuple[int, int]
    c_ratio: float


def _l_sa(p: PTree, x, cfg: RGTConfig, heads: int, shifted: bool):
    """L_SA (rgt/arch.py:239-448); x: (B, H, W, C)."""
    b, h, w, c = x.shape
    sp0, sp1 = cfg.split_size
    sh0, sh1 = sp0 // 2, sp1 // 2

    qkv = F.linear(x, p['qkv.weight'], p.get('qkv.bias'))
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    v_img = v

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

    lcm = p.conv('get_v', v_img, padding=1, groups=c)
    out = attened + lcm
    return F.linear(out, p['proj.weight'], p.get('proj.bias'))


def _rg_sa(p: PTree, x, heads: int, c_ratio: float):
    """RG_SA (rgt/arch.py:450-545); x: (B, H, W, C); eval-time recursion."""
    b, h, w, c = x.shape
    n = h * w
    cr = int(c * c_ratio)
    scale = (c // heads * c_ratio) ** -0.5

    _time = max(int(math.log(h // 16, 4)), int(math.log(w // 16, 4)))
    _time = max(_time, 2)
    _scale = 4**_time

    _x = x
    for _ in range(_time):
        _x = p.conv('reduction1', _x, stride=4, groups=c)
    _x = p.conv('dwconv', _x, padding=1, groups=c)
    _x = p.conv('conv', _x)
    hn, wn = _x.shape[1], _x.shape[2]
    _x = _x.reshape(b, hn * wn, cr)
    _x = F.gelu(F.layer_norm(_x, p['norm_act.0.weight'], p['norm_act.0.bias']))

    xs = x.reshape(b, n, c)
    q = F.linear(xs, p['q.weight'], p.get('q.bias')).reshape(b, n, heads, cr // heads).transpose(0, 2, 1, 3)
    k = F.linear(_x, p['k.weight'], p.get('k.bias')).reshape(b, -1, heads, cr // heads).transpose(0, 2, 1, 3)
    v = F.linear(_x, p['v.weight'], p.get('v.bias')).reshape(b, -1, heads, c // heads).transpose(0, 2, 1, 3)

    attn = jnp.einsum('bhnd,bhmd->bhnm', q, k, preferred_element_type=jnp.float32).astype(x.dtype) * scale
    attn = F.softmax(attn)

    # CPE on v: (B, heads, N', C/heads) -> image (B, H/s, W/s, C)
    np_ = v.shape[2]
    v_img = v.transpose(0, 2, 1, 3).reshape(b, np_, c).reshape(b, h // _scale, w // _scale, c)
    cpe = p.conv('cpe', v_img, padding=1, groups=c)
    v = v + cpe.reshape(b, np_, heads, c // heads).transpose(0, 2, 1, 3)

    out = jnp.einsum('bhnm,bhmd->bhnd', attn, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    out = F.linear(out, p['proj.weight'], p.get('proj.bias'))
    return out.reshape(b, h, w, c)


def _block(p: PTree, x, cfg: RGTConfig, heads: int, rs_id: int, idx: int):
    """Block with HAI (rgt/arch.py:547-620)."""
    res = x
    y = F.layer_norm(x, p['norm1.weight'], p['norm1.bias'])
    if idx % 2 == 0:
        shifted = (rs_id % 2 == 0 and idx > 0 and (idx - 2) % 4 == 0) or (
            rs_id % 2 != 0 and idx % 4 == 0
        )
        y = _l_sa(p.sub('attn'), y, cfg, heads, shifted)
    else:
        y = _rg_sa(p.sub('attn'), y, heads, cfg.c_ratio)
    x = x + y
    y = F.layer_norm(x, p['norm2.weight'], p['norm2.bias'])
    x = x + _sgfn(p.sub('mlp'), y, int(cfg.embed_dim * cfg.mlp_ratio))
    return x + res * p['gamma'].astype(x.dtype)


def _resi_conv(p: PTree, key: str, x, resi_connection: str):
    if resi_connection == '1conv':
        return p.conv(key, x, padding=1)
    q = p.sub(key)
    x = F.leaky_relu(q.conv('0', x, padding=1), 0.2)
    x = F.leaky_relu(q.conv('2', x), 0.2)
    return q.conv('4', x, padding=1)


def apply(cfg: RGTConfig, params, x):
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
            y = _block(gp.sub(f'blocks.{bi}'), y, cfg, cfg.num_heads[gi], gi, bi)
        feat = feat + _resi_conv(gp, 'conv', y, cfg.resi_connection)
    feat = F.layer_norm(feat, p['norm.weight'], p['norm.bias'])
    x = _resi_conv(p, 'conv_after_body', feat, cfg.resi_connection) + x

    x = F.leaky_relu(p.conv('conv_before_upsample.0', x, padding=1), 0.01)
    if cfg.upscale & (cfg.upscale - 1) == 0:
        for i in range(int(math.log2(cfg.upscale))):
            x = F.pixel_shuffle(p.conv(f'upsample.{2 * i}', x, padding=1), 2)
    elif cfg.upscale == 3:
        x = F.pixel_shuffle(p.conv('upsample.0', x, padding=1), 3)
    x = p.conv('conv_last', x, padding=1)
    return x / cfg.img_range + mean


def _get_split_size(sd) -> tuple[int, int]:
    """reference rgt/__init__.py:9-36."""
    a = sd['layers.0.blocks.0.attn.attns.0.relative_position_index'].shape[0]
    b = sd['layers.0.blocks.0.attn.attns.0.rpe_biases'].shape[0]

    def is_solution(ssw, ssh):
        return ssw * ssh == a and (2 * ssw - 1) * (2 * ssh - 1) == b

    square = math.isqrt(a)
    if is_solution(square, square):
        return square, square
    for i in range(1, 10):
        for j in range(i + 1, 10):
            if is_solution(2**i, 2**j):
                return 2**i, 2**j
    raise ValueError(f'No valid split_size found for {a=} and {b=}')


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/rgt/__init__.py:68-130)."""
    in_chans = sd['conv_first.weight'].shape[1]
    embed_dim = sd['conv_first.weight'].shape[0]

    num_layers = get_seq_len(sd, 'layers')
    depth, num_heads = [], []
    for i in range(num_layers):
        depth.append(get_seq_len(sd, f'layers.{i}.blocks'))
        heads_half = sd[f'layers.{i}.blocks.0.attn.attns.0.pos.pos3.2.weight'].shape[0]
        if embed_dim % (heads_half * 2) == 0:
            num_heads.append(heads_half * 2)
        else:
            num_heads.append(heads_half * 2 + 1)

    qkv_bias = 'layers.0.blocks.0.attn.qkv.bias' in sd
    mlp_ratio = sd['layers.0.blocks.0.mlp.fc1.weight'].shape[0] / sd['layers.0.blocks.0.mlp.fc1.weight'].shape[1]
    resi_connection = '1conv' if 'conv_after_body.weight' in sd else '3conv'

    c_ratio = 0.5
    for i, d in enumerate(depth):
        if d >= 2:
            cw = sd[f'layers.{i}.blocks.1.attn.conv.weight']
            c_ratio = cw.shape[0] / cw.shape[1]
            break

    upscale, _ = get_pixelshuffle_params(sd, 'upsample')
    split_size = _get_split_size(sd)

    cfg = RGTConfig(
        in_chans=in_chans, embed_dim=embed_dim, depth=tuple(depth), num_heads=tuple(num_heads),
        mlp_ratio=mlp_ratio, qkv_bias=qkv_bias, upscale=upscale, img_range=1.0,
        resi_connection=resi_connection, split_size=split_size, c_ratio=c_ratio,
    )
    params = {k: v for k, v in sd.items() if '.attn_mask_' not in k}
    meta = ModelMetadata(in_channels=in_chans, out_channels=in_chans, upscale=upscale, name='RGT')
    model = SRModel('RGT', cfg, params, meta, apply)
    # measured on v5e (sweep_tiled.json rgt rows, 720p, re-swept after the
    # r3 benchmark fixes removed the tunnel noise that first made these
    # cells unreadable): t128 b2 wins BOTH dtypes (3.98 f32 / 5.22 bf16
    # MP/s; b4 loses 22% in f32 — the earlier {'f32': 4} hint was
    # noise-derived).
    model.tile_batch = 2
    # r5 tile re-visit at TUNED halos (probe_tile_revisit.json): bf16
    # prefers t160 (8.00 vs 7.32 at t128, +9.3%, reproduced twice; seam
    # 53.1 dB >= t128's 52.3), f32 keeps t128 (5.43 vs 4.62); t192 loses.
    model.serving_tile = {'f32': 128, 'bf16': 160}
    # halo 8 at seam parity (52.3-52.5 dB across halos): 5.41 vs 4.13 f32 /
    # 7.21 vs 5.44 bf16 MP/s at 720p (sweep_halo.json)
    model.serving_halo = 8
    model.size_multiple = max(split_size)
    return model


ARCH = Architecture(
    id='RGT',
    detect_condition=KeyCondition.has_all(
        'conv_first.weight',
        'before_RG.1.weight',
        'layers.0.blocks.0.gamma',
        'layers.0.blocks.0.norm1.weight',
        'layers.0.blocks.0.attn.qkv.weight',
        'layers.0.blocks.0.attn.proj.weight',
        'layers.0.blocks.0.attn.attns.0.rpe_biases',
        'layers.0.blocks.0.attn.attns.0.relative_position_index',
        'layers.0.blocks.0.attn.attns.0.pos.pos_proj.weight',
        'layers.0.blocks.0.mlp.fc1.weight',
        'layers.0.blocks.0.mlp.fc2.weight',
        'layers.0.blocks.0.norm2.weight',
        'norm.weight',
        KeyCondition.has_any('conv_after_body.weight', 'conv_after_body.0.weight'),
        'conv_before_upsample.0.weight',
        'conv_last.weight',
    ),
    load_fn=_load,
)
