"""ATD — Adaptive Token Dictionary transformer.

Parity with resselt/archs/atd/{__init__.py,arch.py}: shared-qkv window
attention, ATD_CA token-dictionary cross attention, AC_MSA sort-based
category attention (argsort/gather with static shapes under jit,
arch.py:289-334), sigma-gated dictionary refresh, flip-mirror padding
(arch.py:1088-1096).

Tie-order bound (VERDICT r1 #6, quantified in
tests/test_atd.py::test_atd_tie_order_bound): AC_MSA sorts by argmax
category id with ``stable=False`` (arch.py:303).  The keys take only
num_tokens distinct values over thousands of tokens, so equal keys are the
normal case, and fixed-size groups cut from the sorted sequence put
same-category tokens into different attention groups depending on tie
order — the reference's output is implementation-defined on essentially
every input.  We pin stable (original-index) order, giving deterministic
output; real checkpoints agree with the stable-sort oracle at >= 82 dB
(parity_report.md).  Measured spread between the reference's own two
legitimate tie orders on an adversarial tiny model: 0.161 max-err on an
11.5-magnitude output (~1.4%); our output sits inside the same class
(0.16-0.24).  Ill-conditioned weights can also near-tie the argmax itself,
which is the same ambiguity one rounding step earlier.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_pixelshuffle_params, get_seq_len, pixelshuffle_scale
from ..nn import functional as F
from ..nn import window as W
from ..nn.params import PTree
from ..nn.window import multi_head_attention, swin_attn_mask, window_partition, window_reverse

_RGB_MEAN = (0.4488, 0.4371, 0.4040)


@dataclass(frozen=True)
class ATDConfig:
    in_chans: int
    embed_dim: int
    depths: tuple[int, ...]
    num_heads: tuple[int, ...]
    window_size: int
    category_size: int
    num_tokens: int
    reducted_dim: int
    convffn_kernel_size: int
    mlp_ratio: float
    qkv_bias: bool
    upscale: int
    img_range: float
    upsampler: str
    resi_connection: str
    norm: bool


def _attn_win(p: PTree, qkv_windows, rpi, heads: int, n: int, mask):
    """WindowAttention with shared qkv input (atd/arch.py:121-192)."""
    c = qkv_windows.shape[-1] // 3
    hd = c // heads
    scale = hd**-0.5
    q, k, v = qkv_windows[..., :c], qkv_windows[..., c : 2 * c], qkv_windows[..., 2 * c :]
    bias = p['relative_position_bias_table'][rpi.reshape(-1)].reshape(n, n, heads)
    bias = bias.transpose(2, 0, 1).astype(qkv_windows.dtype)
    out = multi_head_attention(q, k, v, heads, scale, bias=bias, mask=mask)
    return F.linear(out, p['proj.weight'], p.get('proj.bias'))


def _atd_ca(p: PTree, x, td, num_tokens: int):
    """ATD_CA (atd/arch.py:194-249). Returns (out, post-softmax sim)."""
    q = F.linear(x, p['wq.weight'], p.get('wq.bias'))
    k = F.linear(td, p['wk.weight'], p.get('wk.bias'))
    v = F.linear(td, p['wv.weight'], p.get('wv.bias'))
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    attn = jnp.einsum('bnd,bmd->bnm', q, k, preferred_element_type=jnp.float32).astype(x.dtype)
    scale = jnp.clip(p['scale'].astype(x.dtype), 0, 1)
    attn = attn * (1 + scale * np.log(num_tokens))
    attn = F.softmax(attn)
    out = jnp.einsum('bnm,bmc->bnc', attn, v, preferred_element_type=jnp.float32).astype(x.dtype)
    return out, attn


def _acmsa_group_chunk(b: int, ng: int, heads: int) -> int | None:
    """Groups per AC_MSA einsum chunk: a divisor of ``ng`` keeping the
    batched score count b*heads*csg near 64 (the measured XLA sweet spot,
    tools/probe_rpe_gather.py).  None = leave unchunked."""
    per_group = b * heads
    if ng * per_group < 128:
        return None
    best = None
    for csg in range(1, ng):
        if ng % csg:
            continue
        sz = csg * per_group
        if sz > 128:
            break
        if best is None or abs(sz - 64) <= abs(best * per_group - 64):
            best = csg
    return best


def _ac_msa(p: PTree, qkv, sim, heads: int, category_size: int):
    """AC_MSA (atd/arch.py:252-334): argmax -> sort -> grouped MSA -> unsort."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    gs = min(n, category_size)
    ng = (n + gs - 1) // gs
    pad_n = ng * gs - n

    tk_id = jnp.argmax(sim, axis=-1)
    # stable argsort over category ids. (A counting-sort formulation —
    # histogram + two cumsums over the num_tokens-ary keys — was measured
    # SLOWER on v5e: 130 vs 124 ms/tile at ATD-light 224^2; the (b, n, T)
    # one-hot cumsum costs more than the bitonic sort it replaces.)
    sort_idx = jnp.argsort(tk_id, axis=-1, stable=True)
    # Row shuffles as flattened (b*n, c) single-axis takes: 2.7x the
    # batched take_along_axis and 6x the row scatter on v5e (0.21 vs
    # 0.56 ms gather, 0.16+eps vs 1.00 ms unsort at 192^2 b2 bf16,
    # tools/probe_gather.py). The argsort itself is free (0.013 ms).
    boff = (jnp.arange(b, dtype=sort_idx.dtype) * n)[:, None]
    shuffled = jnp.take(qkv.reshape(b * n, c3), (sort_idx + boff).reshape(-1),
                        axis=0).reshape(b, n, c3)
    if pad_n > 0:
        tail = jnp.flip(shuffled[:, n - pad_n : n, :], axis=1)
        shuffled = jnp.concatenate([shuffled, tail], axis=1)

    y = shuffled.reshape(b, ng, gs, 3, heads, c // heads).transpose(3, 0, 1, 4, 2, 5)
    q, k, v = y[0], y[1], y[2]
    logit_scale = jnp.exp(jnp.minimum(p['logit_scale'].astype(qkv.dtype), np.log(1.0 / 0.01)))

    def _grouped_attn(qc, kc, vc):
        attn = jnp.einsum('bghnd,bghmd->bghnm', qc, kc, preferred_element_type=jnp.float32).astype(qkv.dtype)
        attn = attn * logit_scale
        attn = F.softmax(attn)
        return jnp.einsum('bghnm,bghmd->bghnd', attn, vc, preferred_element_type=jnp.float32).astype(qkv.dtype)

    # XLA's batched attention degrades past ~128 stacked (group, head)
    # matrices just like the window case (nn/window.py::use_chunked_attention);
    # chunk along the group axis so each einsum sees ~64 score matrices.
    csg = _acmsa_group_chunk(b, ng, heads) if W.chunked_attention_enabled() else None
    if csg is not None:
        out = jnp.concatenate(
            [_grouped_attn(q[:, s : s + csg], k[:, s : s + csg], v[:, s : s + csg])
             for s in range(0, ng, csg)], axis=1)
    else:
        out = _grouped_attn(q, k, v)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, n + pad_n, c)[:, :n, :]

    # unsort (atd/arch.py:322-325): invert the permutation with a cheap
    # (b, n) int32 scatter, then gather rows back — a row scatter of the
    # activations measured 6x slower than this on v5e (probe_gather.py)
    inv = jnp.zeros_like(sort_idx).at[jnp.arange(b)[:, None], sort_idx].set(
        jnp.broadcast_to(jnp.arange(n, dtype=sort_idx.dtype), (b, n)))
    out = jnp.take(out.reshape(b * n, c), (inv + boff).reshape(-1),
                   axis=0).reshape(b, n, c)
    return F.linear(out, p['proj.weight'], p.get('proj.bias'))


def _convffn(p: PTree, x, h: int, w: int, k: int):
    """ConvFFN (atd/arch.py:64-87); x: (B, N, C)."""
    b, n, cin = x.shape
    x = F.gelu(p.linear('fc1', x))
    hid = x.shape[-1]
    img = x.reshape(b, h, w, hid)
    img = F.gelu(p.conv('dwconv.depthwise_conv.0', img, padding=(k - 1) // 2, groups=hid))
    x = x + img.reshape(b, n, hid)
    return p.linear('fc2', x)


def _instance_norm1d(x, weight, bias, eps: float = 1e-5):
    """InstanceNorm1d(affine) over (B, C, N): normalize per (b, c) over N."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) / jnp.sqrt(var + eps)
    return y * weight.astype(x.dtype)[None, :, None] + bias.astype(x.dtype)[None, :, None]


def _atd_layer(p: PTree, x, td, cfg: ATDConfig, heads: int, shift: int, rpi, is_last: bool, h: int, w: int):
    """ATDTransformerLayer (atd/arch.py:337-487); x: (B, N, C)."""
    b, n, c = x.shape
    ws = cfg.window_size
    shortcut = x
    xn = F.layer_norm(x, p['norm1.weight'], p['norm1.bias'])
    qkv = F.linear(xn, p['wqkv.weight'], p.get('wqkv.bias'))

    x_atd, sim_atd = _atd_ca(p.sub('attn_atd'), xn, td, cfg.num_tokens)
    x_aca = _ac_msa(p.sub('attn_aca'), qkv, sim_atd, heads, cfg.category_size)

    qkv_img = qkv.reshape(b, h, w, 3 * c)
    if shift > 0:
        qkv_img = jnp.roll(qkv_img, shift=(-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(swin_attn_mask(h, w, ws, ws // 2), x.dtype)
    else:
        mask = None
    windows = window_partition(qkv_img, ws)
    attn_windows = _attn_win(p.sub('attn_win'), windows, rpi, heads, ws * ws, mask)
    x_win = window_reverse(attn_windows, ws, h, w)
    if shift > 0:
        x_win = jnp.roll(x_win, shift=(shift, shift), axis=(1, 2))

    x = shortcut + x_win.reshape(b, n, c) + x_atd + x_aca
    x = x + _convffn(p.sub('convffn'), F.layer_norm(x, p['norm2.weight'], p['norm2.bias']), h, w, cfg.convffn_kernel_size)

    if not is_last:
        mask_soft = F.softmax(_instance_norm1d(sim_atd.swapaxes(-1, -2), p['norm3.weight'], p['norm3.bias']))
        s = F.sigmoid(p['sigma'].astype(x.dtype))
        td = s * td + (1 - s) * jnp.einsum('btn,bnc->btc', mask_soft, x, preferred_element_type=jnp.float32).astype(x.dtype)
    return x, td


def _resi_conv(p: PTree, key: str, x, resi_connection: str):
    if resi_connection == '1conv':
        return p.conv(key, x, padding=1)
    q = p.sub(key)
    x = F.leaky_relu(q.conv('0', x, padding=1), 0.2)
    x = F.leaky_relu(q.conv('2', x), 0.2)
    return q.conv('4', x, padding=1)


def apply(cfg: ATDConfig, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    ws = cfg.window_size
    h = ((h0 + ws - 1) // ws) * ws
    w = ((w0 + ws - 1) // ws) * ws
    # flip-mirror pad (atd/arch.py:1090-1096)
    x = jnp.concatenate([x, jnp.flip(x, axis=1)], axis=1)[:, :h, :, :]
    x = jnp.concatenate([x, jnp.flip(x, axis=2)], axis=2)[:, :, :w, :]

    if cfg.norm:
        mean = jnp.asarray(_RGB_MEAN, x.dtype) if cfg.in_chans == 3 else jnp.zeros((1,), x.dtype)
        x = (x - mean) * cfg.img_range

    rpi = p['relative_position_index_SA']

    def features(feat_img):
        b = feat_img.shape[0]
        feat = feat_img.reshape(b, h * w, cfg.embed_dim)
        if 'patch_embed.norm.weight' in params:
            feat = F.layer_norm(feat, p['patch_embed.norm.weight'], p['patch_embed.norm.bias'])
        for li, depth in enumerate(cfg.depths):
            lp = p.sub(f'layers.{li}')
            y = feat
            td = jnp.broadcast_to(lp['residual_group.td'].astype(feat.dtype)[None], (b, cfg.num_tokens, cfg.embed_dim))
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else ws // 2
                y, td = _atd_layer(
                    lp.sub(f'residual_group.layers.{bi}'), y, td, cfg,
                    cfg.num_heads[li], shift, rpi, bi == depth - 1, h, w,
                )
            y_img = y.reshape(b, h, w, cfg.embed_dim)
            y_img = _resi_conv(lp, 'conv', y_img, cfg.resi_connection)
            feat = feat + y_img.reshape(b, h * w, cfg.embed_dim)
        feat = F.layer_norm(feat, p['norm.weight'], p['norm.bias'])
        return feat.reshape(b, h, w, cfg.embed_dim)

    if cfg.upsampler == 'pixelshuffle':
        x = p.conv('conv_first', x, padding=1)
        x = _resi_conv(p, 'conv_after_body', features(x), cfg.resi_connection) + x
        x = F.leaky_relu(p.conv('conv_before_upsample.0', x, padding=1), 0.01)
        if cfg.upscale & (cfg.upscale - 1) == 0:
            for i in range(int(math.log2(cfg.upscale))):
                x = F.pixel_shuffle(p.conv(f'upsample.{2 * i}', x, padding=1), 2)
        elif cfg.upscale == 3:
            x = F.pixel_shuffle(p.conv('upsample.0', x, padding=1), 3)
        x = p.conv('conv_last', x, padding=1)
    elif cfg.upsampler == 'pixelshuffledirect':
        x = p.conv('conv_first', x, padding=1)
        x = _resi_conv(p, 'conv_after_body', features(x), cfg.resi_connection) + x
        x = F.pixel_shuffle(p.conv('upsample.0', x, padding=1), cfg.upscale)
    elif cfg.upsampler == 'nearest+conv':
        x = p.conv('conv_first', x, padding=1)
        x = _resi_conv(p, 'conv_after_body', features(x), cfg.resi_connection) + x
        x = F.leaky_relu(p.conv('conv_before_upsample.0', x, padding=1), 0.01)
        x = F.leaky_relu(p.conv('conv_up1', F.interpolate_nearest(x, 2), padding=1), 0.2)
        x = F.leaky_relu(p.conv('conv_up2', F.interpolate_nearest(x, 2), padding=1), 0.2)
        x = p.conv('conv_last', F.leaky_relu(p.conv('conv_hr', x, padding=1), 0.2), padding=1)
    else:
        x_first = p.conv('conv_first', x, padding=1)
        res = _resi_conv(p, 'conv_after_body', features(x_first), cfg.resi_connection) + x_first
        x = x + p.conv('conv_last', res, padding=1)

    if cfg.norm:
        x = x / cfg.img_range + mean
    return x[:, : h0 * cfg.upscale, : w0 * cfg.upscale]


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/atd/__init__.py:48-121)."""
    in_chans = sd['conv_first.weight'].shape[1]
    embed_dim = sd['conv_first.weight'].shape[0]
    window_size = math.isqrt(sd['relative_position_index_SA'].shape[0])

    num_layers = get_seq_len(sd, 'layers')
    depths, num_heads = [], []
    for i in range(num_layers):
        depths.append(get_seq_len(sd, f'layers.{i}.residual_group.layers'))
        num_heads.append(sd[f'layers.{i}.residual_group.layers.0.attn_win.relative_position_bias_table'].shape[1])

    num_tokens = sd['layers.0.residual_group.layers.0.attn_atd.scale'].shape[0]
    reducted_dim = sd['layers.0.residual_group.layers.0.attn_atd.wq.weight'].shape[0]
    convffn_kernel_size = sd['layers.0.residual_group.layers.0.convffn.dwconv.depthwise_conv.0.weight'].shape[2]
    mlp_ratio = sd['layers.0.residual_group.layers.0.convffn.fc1.weight'].shape[0] / embed_dim
    qkv_bias = 'layers.0.residual_group.layers.0.wqkv.bias' in sd
    resi_connection = '1conv' if 'layers.0.conv.weight' in sd else '3conv'

    if 'conv_up1.weight' in sd:
        upsampler, upscale = 'nearest+conv', 4
    elif 'conv_before_upsample.0.weight' in sd:
        upsampler = 'pixelshuffle'
        upscale, _ = get_pixelshuffle_params(sd, 'upsample')
    elif 'conv_last.weight' in sd:
        upsampler, upscale = '', 1
    else:
        upsampler = 'pixelshuffledirect'
        upscale = pixelshuffle_scale(sd['upsample.0.weight'].shape[0], in_chans)

    norm = 'no_norm' not in sd
    is_light = upsampler == 'pixelshuffledirect' and embed_dim == 48
    category_size = 128 if is_light else 256

    cfg = ATDConfig(
        in_chans=in_chans, embed_dim=embed_dim, depths=tuple(depths), num_heads=tuple(num_heads),
        window_size=window_size, category_size=category_size, num_tokens=num_tokens,
        reducted_dim=reducted_dim, convffn_kernel_size=convffn_kernel_size, mlp_ratio=mlp_ratio,
        qkv_bias=qkv_bias, upscale=upscale, img_range=1.0, upsampler=upsampler,
        resi_connection=resi_connection, norm=norm,
    )
    params = {k: v for k, v in sd.items() if k != 'no_norm'}
    meta = ModelMetadata(in_channels=in_chans, out_channels=in_chans, upscale=upscale, name='ATD')
    model = SRModel('ATD', cfg, params, meta, apply)
    # measured on v5e (sweep_tiled.json FHD; probe_atd_serving.json r5):
    # f32 tile rows are gather-bandwidth-bound and peak at batch 1,
    # bf16 at batch 2 (6.63 vs 5.92 at t192)
    model.tile_batch = {'f32': 1, 'bf16': 2}
    # r5 tile re-sweep at the tuned halos (probe_atd_serving.json): t160
    # wins BOTH dtypes — f32 7.22 MP/s (b1 h16: 192px window, EVEN
    # 12-wide grid, vs 6.23 at t192/5.88 t128/5.78 t224) closing the r3
    # ">= 7 MP/s" target, bf16 10.80 (b2 h8: 176px 11-wide odd grid is
    # fine in bf16, vs 9.58 at t192/9.86 t128b4).  Seam PSNR at t160 is
    # 32.57-32.58 dB vs 33.25 at t192 — within the halo/batch-independent
    # content-divergence band (the residual is AC_MSA's whole-image
    # category statistics, not seams; it drifts ~1 dB with tile size:
    # 31.6 at t128, 33.05 at t224).
    model.serving_tile = 160
    # fastest halo per dtype (halo-independent seams): f32 needs the even
    # grid (h16), bf16 takes h8's smaller window
    model.serving_halo = {'f32': 16, 'bf16': 8}
    model.size_multiple = window_size
    return model


ARCH = Architecture(
    id='ATD',
    detect_condition=KeyCondition.has_all(
        'relative_position_index_SA',
        'conv_first.weight',
        'conv_first.bias',
        'layers.0.residual_group.td',
        'layers.0.residual_group.layers.0.sigma',
        'layers.0.residual_group.layers.0.norm1.weight',
        'layers.0.residual_group.layers.0.norm1.bias',
        'layers.0.residual_group.layers.0.norm2.weight',
        'layers.0.residual_group.layers.0.norm2.bias',
        'layers.0.residual_group.layers.0.norm3.weight',
        'layers.0.residual_group.layers.0.norm3.bias',
        'layers.0.residual_group.layers.0.wqkv.weight',
        'layers.0.residual_group.layers.0.attn_win.relative_position_bias_table',
        'layers.0.residual_group.layers.0.attn_win.proj.weight',
        'layers.0.residual_group.layers.0.attn_win.proj.bias',
        'layers.0.residual_group.layers.0.attn_atd.scale',
        'layers.0.residual_group.layers.0.attn_atd.wq.weight',
        'layers.0.residual_group.layers.0.attn_atd.wk.weight',
        'layers.0.residual_group.layers.0.attn_atd.wv.weight',
        'layers.0.residual_group.layers.0.attn_aca.logit_scale',
        'layers.0.residual_group.layers.0.attn_aca.proj.weight',
        'layers.0.residual_group.layers.0.convffn.fc1.weight',
        'layers.0.residual_group.layers.0.convffn.fc1.bias',
        'layers.0.residual_group.layers.0.convffn.dwconv.depthwise_conv.0.weight',
        'layers.0.residual_group.layers.0.convffn.dwconv.depthwise_conv.0.bias',
        'layers.0.residual_group.layers.0.convffn.fc2.weight',
        'layers.0.residual_group.layers.0.convffn.fc2.bias',
        'norm.weight',
        'norm.bias',
    ),
    load_fn=_load,
)
