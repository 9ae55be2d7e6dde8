"""HAT — Hybrid Attention Transformer.

Parity with resselt/archs/hat/{__init__.py,arch.py}: HAB (window attention
+ CAB channel-attention conv branch), OCAB (overlapping cross-attention via
patch extraction), RHAG groups, pixelshuffle tail.  rpi buffers come from
the checkpoint (relative_position_index_SA/OCA, arch.py:877-880).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_pixelshuffle_params, get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.window import multi_head_attention, swin_attn_mask, window_partition, window_reverse

_RGB_MEAN = (0.4488, 0.4371, 0.4040)


@dataclass(frozen=True)
class HATConfig:
    in_chans: int
    embed_dim: int
    depths: tuple[int, ...]
    num_heads: tuple[int, ...]
    window_size: int
    overlap_win_size: int
    compress_ratio: float
    squeeze_factor: float
    conv_scale: float
    mlp_ratio: float
    qkv_bias: bool
    upscale: int
    img_range: float
    resi_connection: str
    num_feat: int
    img_size: int


def _cab(p: PTree, x, dim: int, cfg: HATConfig):
    """Channel attention conv block (hat/arch.py:20-59)."""
    y = F.gelu(p.conv('cab.0', x, padding=1))
    y = p.conv('cab.2', y, padding=1)
    a = jnp.mean(y, axis=(1, 2), keepdims=True)
    a = F.relu(p.conv('cab.3.attention.1', a))
    a = F.sigmoid(p.conv('cab.3.attention.3', a))
    return y * a


def _window_attn(p: PTree, windows, rpi, num_heads: int, n: int, mask):
    c = windows.shape[-1]
    scale = (c // num_heads) ** -0.5
    bias = p['relative_position_bias_table'][rpi.reshape(-1)].reshape(n, n, num_heads)
    bias = bias.transpose(2, 0, 1).astype(windows.dtype)

    import jax

    from ..nn.window import packed_attention_enabled

    hd = c // num_heads
    if (packed_attention_enabled() and jax.default_backend() != 'cpu'
            and n % 128 == 0 and hd <= 32
            and (mask is None or windows.shape[0] % mask.shape[0] == 0)):
        from ..nn.window import packed_qkv_attention

        hd_pad = 16 if hd <= 16 else 32
        return packed_qkv_attention(p, windows, bias, mask, num_heads, hd_pad=hd_pad)

    qkv = F.linear(windows, p['qkv.weight'], p.get('qkv.bias'))
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    out = multi_head_attention(q, k, v, num_heads, scale, bias=bias, mask=mask)
    return F.linear(out, p['proj.weight'], p.get('proj.bias'))


def _hab(p: PTree, x, cfg: HATConfig, num_heads: int, shift: int, rpi_sa):
    """Hybrid Attention Block (hat/arch.py:218-348)."""
    h, w = x.shape[1], x.shape[2]
    ws = cfg.window_size
    shortcut = x
    x = F.layer_norm(x, p['norm1.weight'], p['norm1.bias'])

    conv_x = _cab(p.sub('conv_block'), x, cfg.embed_dim, cfg)

    if shift > 0:
        shifted = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
        mask = swin_attn_mask(h, w, ws, shift)
        mask = jnp.asarray(mask, x.dtype)
    else:
        shifted = x
        mask = None
    windows = window_partition(shifted, ws)
    attn = _window_attn(p.sub('attn'), windows, rpi_sa, num_heads, ws * ws, mask)
    shifted = window_reverse(attn, ws, h, w)
    attn_x = jnp.roll(shifted, shift=(shift, shift), axis=(1, 2)) if shift > 0 else shifted

    x = shortcut + attn_x + conv_x * cfg.conv_scale
    y = F.layer_norm(x, p['norm2.weight'], p['norm2.bias'])
    y = p.linear('mlp.fc2', F.gelu(p.linear('mlp.fc1', y)))
    return x + y


def _overlap_windows(kv, ws: int, owin: int):
    """Overlapping (owin, owin) windows at stride ws, zero-padded.

    Matches torch ``nn.Unfold(owin, stride=ws, padding=(owin-ws)//2)``
    (reference hat/arch.py:377-381) but is built purely from
    slice/reshape/stack of non-overlapping ``g = gcd(ws, owin)`` sub-blocks —
    XLA lowers it to plain copies.  The naive alternative
    (``conv_general_dilated_patches``) lowers to an identity conv with
    C*owin^2 output channels, which both materializes the patches at conv
    cost and dominated HAT's runtime (measured: 6 OCABs ~= 54% of the whole
    HAT-S forward).

    Returns (b * nwin, owin*owin, c) with row-major window positions.
    """
    b, h, w, c = kv.shape
    pad = (owin - ws) // 2
    g = math.gcd(ws, owin)
    na = owin // g
    ni, nj = h // ws, w // ws
    # after = pad + (ws - g): chunk a's strided reshape needs g*a + ws*n rows;
    # the surplus rows land in each 16-block's unused [g:ws] tail
    kvp = jnp.pad(kv, ((0, 0), (pad, pad + ws - g), (pad, pad + ws - g), (0, 0)))
    wp = kvp.shape[2]
    rows = jnp.stack(
        [
            kvp[:, g * a : g * a + ws * ni].reshape(b, ni, ws, wp, c)[:, :, :g]
            for a in range(na)
        ],
        axis=2,
    )  # (b, ni, na, g, wp, c)
    wins = jnp.stack(
        [
            rows[:, :, :, :, g * e : g * e + ws * nj].reshape(b, ni, na, g, nj, ws, c)[..., :g, :]
            for e in range(na)
        ],
        axis=5,
    )  # (b, ni, na, g, nj, na, g, c)
    wins = wins.transpose(0, 1, 4, 2, 3, 5, 6, 7)
    return wins.reshape(b * ni * nj, owin * owin, c)


def _ocab(p: PTree, x, cfg: HATConfig, num_heads: int, rpi_oca):
    """Overlapping cross-attention block (hat/arch.py:351-481)."""
    h, w = x.shape[1], x.shape[2]
    ws = cfg.window_size
    owin = cfg.overlap_win_size
    c = cfg.embed_dim

    shortcut = x
    x = F.layer_norm(x, p['norm1.weight'], p['norm1.bias'])
    qkv = F.linear(x, p['qkv.weight'], p.get('qkv.bias'))
    q = qkv[..., :c]
    kv = qkv[..., c:]

    q_windows = window_partition(q, ws)  # (b*nw, ws*ws, c)

    patches = _overlap_windows(kv, ws, owin)  # (b*nw, owin*owin, 2c)
    k_windows = patches[..., :c]
    v_windows = patches[..., c:]

    hd = c // num_heads
    scale = hd**-0.5
    nq, n = ws * ws, owin * owin
    bias = p['relative_position_bias_table'][rpi_oca.reshape(-1)].reshape(nq, n, num_heads)
    bias = bias.transpose(2, 0, 1).astype(x.dtype)
    # rectangular (nq x n) cross-attention through the shared dispatch —
    # picks up the >=128-window chunked path (nn/window.py)
    out = multi_head_attention(q_windows, k_windows, v_windows, num_heads, scale, bias=bias)
    out = window_reverse(out, ws, h, w)

    x = F.linear(out, p['proj.weight'], p.get('proj.bias')) + shortcut
    y = F.layer_norm(x, p['norm2.weight'], p['norm2.bias'])
    y = p.linear('mlp.fc2', F.gelu(p.linear('mlp.fc1', y)))
    return x + y


def apply(cfg: HATConfig, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    if cfg.in_chans == 3:
        mean = jnp.asarray(_RGB_MEAN, x.dtype)
    else:
        mean = jnp.zeros((1,), x.dtype)
    x = (x - mean) * cfg.img_range
    x = F.pad_to_multiple(x, cfg.window_size, mode='reflect')

    rpi_sa = p['relative_position_index_SA']
    rpi_oca = p['relative_position_index_OCA']

    x = p.conv('conv_first', x, padding=1)
    feat = x
    if 'patch_embed.norm.weight' in params:
        feat = F.layer_norm(feat, p['patch_embed.norm.weight'], p['patch_embed.norm.bias'])
    for li, depth in enumerate(cfg.depths):
        lp = p.sub(f'layers.{li}')
        y = feat
        for bi in range(depth):
            shift = 0 if bi % 2 == 0 else cfg.window_size // 2
            y = _hab(lp.sub(f'residual_group.blocks.{bi}'), y, cfg, cfg.num_heads[li], shift, rpi_sa)
        y = _ocab(lp.sub('residual_group.overlap_attn'), y, cfg, cfg.num_heads[li], rpi_oca)
        if cfg.resi_connection == '1conv':
            y = lp.conv('conv', y, padding=1)
        feat = feat + y
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


def _get_overlap_ratio(window_size: int, with_overlap: int) -> float:
    """reference hat/__init__.py:8-23."""
    for ratio in [0, 1, 0.5, 0.25, 0.75, 0.1, 0.2, 0.3, 0.4, 0.6, 0.7, 0.8, 0.9]:
        if int(window_size + window_size * ratio) == with_overlap:
            return ratio
    return (with_overlap - window_size) / window_size + 0.01


def _inv_int_div(a: int, c: int) -> float:
    """reference hat/__init__.py:26-47."""
    b_float = a / c
    if b_float.is_integer():
        return int(b_float)
    if c == a // math.ceil(b_float):
        return math.ceil(b_float)
    if c == a // math.floor(b_float):
        return math.floor(b_float)
    if c == a // b_float:
        return b_float
    if c == a // (b_float - 0.01):
        return b_float - 0.01
    if c == a // (b_float + 0.01):
        return b_float + 0.01
    raise ValueError(f'Could not find b with a // b == c. a={a}, c={c}')


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/hat/__init__.py:76-194)."""
    in_chans = sd['conv_first.weight'].shape[1]
    embed_dim = sd['conv_first.weight'].shape[0]
    num_feat = sd['conv_last.weight'].shape[1]
    upscale, _ = get_pixelshuffle_params(sd, 'upsample', num_feat)

    window_size = int(math.sqrt(sd['relative_position_index_SA'].shape[0]))
    overlap_ratio = _get_overlap_ratio(
        window_size, with_overlap=int(math.sqrt(sd['relative_position_index_OCA'].shape[1]))
    )
    overlap_win_size = int(window_size * overlap_ratio) + window_size

    num_layers = get_seq_len(sd, 'layers')
    depths = tuple(get_seq_len(sd, f'layers.{i}.residual_group.blocks') for i in range(num_layers))
    num_heads = tuple(
        sd[f'layers.{i}.residual_group.overlap_attn.relative_position_bias_table'].shape[1]
        for i in range(num_layers)
    )

    resi_connection = '1conv' if 'conv_after_body.weight' in sd else 'identity'
    compress_ratio = _inv_int_div(embed_dim, sd['layers.0.residual_group.blocks.0.conv_block.cab.0.weight'].shape[0])
    squeeze_factor = _inv_int_div(
        embed_dim, sd['layers.0.residual_group.blocks.0.conv_block.cab.3.attention.1.weight'].shape[0]
    )
    qkv_bias = 'layers.0.residual_group.blocks.0.attn.qkv.bias' in sd
    mlp_hidden_dim = int(sd['layers.0.residual_group.blocks.0.mlp.fc1.weight'].shape[0])
    mlp_ratio = mlp_hidden_dim / embed_dim
    img_size = 64
    if 'absolute_pos_embed' in sd:
        img_size = int(math.sqrt(sd['absolute_pos_embed'].shape[1]))

    cfg = HATConfig(
        in_chans=in_chans, embed_dim=embed_dim, depths=depths, num_heads=num_heads,
        window_size=window_size, overlap_win_size=overlap_win_size,
        compress_ratio=compress_ratio, squeeze_factor=squeeze_factor, conv_scale=0.01,
        mlp_ratio=mlp_ratio, qkv_bias=qkv_bias, upscale=upscale, img_range=1.0,
        resi_connection=resi_connection, num_feat=num_feat, img_size=img_size,
    )
    meta = ModelMetadata(in_channels=in_chans, out_channels=in_chans, upscale=upscale, name='HAT')
    model = SRModel('HAT', cfg, dict(sd), meta, apply)
    # measured on v5e (sweep_tiled.json, 720p joint tile×batch sweep):
    # HAT tiles lose to VMEM pressure above batch 2 at both 128 and 192px
    # (t192: b2 2.80/4.85 vs b4 2.52/3.99 f32/bf16 MP/s); serving tile 192
    # beats 128 at this batch (the round-2 "tiles>128 worse" note was b8)
    model.tile_batch = 2
    model.serving_tile = 192
    # halo swept (sweep_halo.json): HAT is the one tiled transformer where
    # smaller halos LOSE — h8's 208px window is a 13-wide window grid that
    # XLA runs slower than h16's 224px/14-wide (f32 3.33 vs 3.86, bf16 5.81
    # vs 6.51); h24 loses outright.  Keep the driver default explicit.
    # The h4/h12 "better seams" sweep anomaly is EXPLAINED and rejected
    # (probe_hat_seam.json, r5): throughput collapses by PADDED window
    # (h12==h16 exactly: 3.865/3.863 f32, 6.508/6.511 bf16 — HAT pads
    # 216->224 internally), and the 13-18 dB seam-PSNR gap is entirely an
    # IMAGE-BORDER band (last 8 output px; seam bands equal interior noise
    # for every halo).  It appears only when the image side is NOT a
    # window multiple (the metric's 483px geometry): the whole-image run
    # reflect-pads 13 rows while h16's unpadded border-flush tiles
    # mask-truncate, whereas h12's internal 8-row reflect pad mimics the
    # whole run.  At multiple-of-16 serving sizes (720p/FHD/4K) the whole
    # image has no pad and h16 matches it exactly — h16 keeps both hints.
    model.serving_halo = 16
    model.size_multiple = window_size
    return model


ARCH = Architecture(
    id='HAT',
    detect_condition=KeyCondition.has_all(
        'relative_position_index_SA',
        'conv_first.weight',
        'layers.0.residual_group.blocks.0.norm1.weight',
        'layers.0.residual_group.blocks.0.conv_block.cab.0.weight',
        'layers.0.residual_group.blocks.0.conv_block.cab.2.weight',
        'layers.0.residual_group.blocks.0.conv_block.cab.3.attention.1.weight',
        'layers.0.residual_group.blocks.0.conv_block.cab.3.attention.3.weight',
        'layers.0.residual_group.blocks.0.mlp.fc1.bias',
        'layers.0.residual_group.blocks.0.mlp.fc2.weight',
        'layers.0.residual_group.overlap_attn.relative_position_bias_table',
        'layers.0.residual_group.overlap_attn.qkv.weight',
        'layers.0.residual_group.overlap_attn.proj.weight',
        'layers.0.residual_group.overlap_attn.mlp.fc1.weight',
        'layers.0.residual_group.overlap_attn.mlp.fc2.weight',
        'conv_last.weight',
    ),
    load_fn=_load,
)
