"""RHA — Residual Hybrid Attention.

Parity with resselt/archs/rha/{__init__.py,arch.py}: focused linear window
attention with depthwise positional conv, OmniShift (collapsed at load),
hybrid conv/attention gated blocks with per-group downsampling, scalar
``down_sample``/``unshuffle`` config buffers, UniUpsample tail,
pad-to-max(down)*window*unshuffle geometry (arch.py:512-519).

Deviation: for unshuffle_mod checkpoints the reference crops the output with
the internal scale 4 instead of the real scale (arch.py:536,560-565), so
non-aligned inputs come back the wrong size; we crop to the true scale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.reparam import collapse_all, omnishift_collapse
from ..nn.upsample import SAMPLE_MODS, uni_upsample


@dataclass(frozen=True)
class RHAConfig:
    dim: int
    scale: int
    in_ch: int
    out_ch: int
    mid_dim: int
    down_list: tuple[int, ...]
    expansion_ratio: float
    group_blocks: int
    res_blocks: int
    upsample: str
    unshuffle_mod: bool
    unshuffle: int
    window_size: int


def _fla(p: PTree, x, ws: int, focusing_factor: int = 3):
    """FocusedLinearAttention (rha/arch.py:188-302); x: (B, H, W, C)."""
    b0, h, w, c = x.shape
    windows = x.reshape(b0, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
    b, n, _ = windows.shape
    nh = c // p['dwc.weight'].shape[0]
    hd = c // nh

    qkv = F.linear(windows, p['qkv.weight'], p.get('qkv.bias'))
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    k = k + p['positional_encoding'].astype(x.dtype).reshape(1, n, c)
    q = F.relu(q) + 1e-6
    k = F.relu(k) + 1e-6
    scale = jax.nn.softplus(p['scale'].astype(x.dtype)).reshape(1, 1, c)
    q = q / scale
    k = k / scale
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    kn = jnp.linalg.norm(k, axis=-1, keepdims=True)
    q = q**focusing_factor
    k = k**focusing_factor
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * qn
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * kn

    q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)

    z = 1.0 / (jnp.einsum('bhnd,bhmd->bhnm', q, k.mean(axis=2, keepdims=True)) + 1e-6)
    kv = jnp.einsum('bhnd,bhne->bhde', k * (n**-0.5), v * (n**-0.5), preferred_element_type=jnp.float32).astype(x.dtype)
    out = jnp.einsum('bhnd,bhde->bhne', q, kv, preferred_element_type=jnp.float32).astype(x.dtype) * z

    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    v_img = v.reshape(b * nh, ws, ws, hd)
    dwc = F.conv2d(v_img, p['dwc.weight'], p.get('dwc.bias'), padding=p['dwc.weight'].shape[-1] // 2, groups=hd)
    out = out + dwc.reshape(b, nh, n, hd).transpose(0, 2, 1, 3).reshape(b, n, c)
    out = F.linear(out, p['proj.weight'], p.get('proj.bias'))

    out = out.reshape(b0, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b0, h, w, c)
    return out


def _hybrid_attention(p: PTree, x, down: int, shift: int, ws: int):
    """HybridAttention (rha/arch.py:398-415)."""
    c = x.shape[-1]
    half = c // 2
    x1, x2 = x[..., :half], x[..., half:]
    x1 = p.conv('conv.conv5x5_reparam', x1, padding=2, groups=half)
    y = x2
    if down > 1:
        y = F.max_pool2d(y, down)
    if shift:
        y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
    y = _fla(p.sub('att.2'), y, ws)
    if shift:
        y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
    if down > 1:
        y = F.interpolate_bilinear(y, scale_factor=down)
    out = F.mish(p.conv('aggr.0', jnp.concatenate([x1, y], axis=-1)))
    return out * x


def _gated_block(p: PTree, x, cfg: RHAConfig, down: int, shift: int):
    """GatedCNNBlock (rha/arch.py:418-451)."""
    shortcut = x
    x = F.layer_norm(x, p['norm.weight'], p['norm.bias'], eps=1e-6)
    hidden = int(cfg.expansion_ratio * cfg.dim)
    x = p.conv('fc1', x, padding=1)
    g = x[..., :hidden]
    i = x[..., hidden : 2 * hidden - cfg.dim]
    c = x[..., 2 * hidden - cfg.dim :]
    c = _hybrid_attention(p.sub('conv'), c, down, shift, cfg.window_size)
    x = F.mish(p.conv('fc2', F.mish(g) * jnp.concatenate([i, c], axis=-1), padding=1))
    return x + shortcut


def apply(cfg: RHAConfig, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    pad = (cfg.unshuffle if cfg.unshuffle > 0 else 1) * max(cfg.down_list) * cfg.window_size
    x = F.pad_to_multiple(x, pad, mode='reflect')

    if cfg.unshuffle_mod:
        x = F.pixel_unshuffle(x, cfg.unshuffle)
        feat = p.conv('to_feat.1', x, padding=1)
    else:
        feat = p.conv('to_feat', x, padding=1)

    out = feat
    for gi in range(cfg.group_blocks):
        gp = p.sub(f'body.{gi}')
        down = cfg.down_list[gi]
        y = out
        for bi in range(cfg.res_blocks):
            shift = 0 if bi % 2 == 0 else cfg.window_size // 2
            y = _gated_block(gp.sub(f'body.{bi}'), y, cfg, down, shift)
        y = gp.conv(f'body.{cfg.res_blocks}.conv5x5_reparam', y, padding=2, groups=cfg.dim)
        y = gp.conv(f'body.{cfg.res_blocks + 1}', y)
        out = y + out
    out = out + feat

    to_img_scale = 4 if cfg.unshuffle_mod else cfg.scale
    out = uni_upsample(p.sub('to_img'), out, cfg.upsample, to_img_scale, cfg.out_ch, cfg.mid_dim)
    return out[:, : h0 * cfg.scale, : w0 * cfg.scale]


_MARKERS = {'alpha1': (omnishift_collapse, 'conv5x5_reparam')}


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/rha/__init__.py:46-83)."""
    unshuffle = 1
    unshuffle_mod = False
    if 'unshuffle' in sd:
        unshuffle = int(sd['unshuffle'].reshape(-1)[0])
        unshuffle_mod = True
        dim, in_ch = sd['to_feat.1.weight'].shape[:2]
        in_ch //= unshuffle**2
    else:
        dim, in_ch = sd['to_feat.weight'].shape[:2]
    group_blocks = get_seq_len(sd, 'body')
    res_blocks = get_seq_len(sd, 'body.0.body') - 2
    down_list = tuple(int(sd[f'body.{i}.down_sample'].reshape(-1)[0]) for i in range(group_blocks))
    expansion_ratio = sd['body.0.body.0.fc1.weight'].shape[0] / 2 / dim
    meta_buf = [int(v) for v in sd['to_img.MetaUpsample'].reshape(-1)]
    _, index, scale, _, out_ch, upsample_dim, _ = meta_buf
    upsampler = SAMPLE_MODS[index]
    scale //= unshuffle
    window_size = math.isqrt(sd['body.0.body.0.conv.att.2.positional_encoding'].shape[1])

    cfg = RHAConfig(
        dim=dim, scale=scale, in_ch=in_ch, out_ch=out_ch, mid_dim=upsample_dim,
        down_list=down_list, expansion_ratio=expansion_ratio, group_blocks=group_blocks,
        res_blocks=res_blocks, upsample=upsampler, unshuffle_mod=unshuffle_mod,
        unshuffle=unshuffle, window_size=window_size,
    )
    params = collapse_all(sd, _MARKERS)
    params = {
        k: v for k, v in params.items()
        if k not in ('to_img.MetaUpsample', 'unshuffle') and not k.endswith('.down_sample')
    }
    meta = ModelMetadata(in_channels=in_ch, out_channels=out_ch, upscale=scale, name='RHA')
    return SRModel('RHA', cfg, params, meta, apply)


ARCH = Architecture(
    id='RHA',
    detect_condition=KeyCondition.has_all(
        'body.0.down_sample',
        'body.0.body.0.norm.weight',
        'body.0.body.0.fc1.weight',
        'body.0.body.0.conv.att.2.qkv.weight',
        'body.0.body.0.conv.att.2.positional_encoding',
        'body.0.body.0.conv.att.2.scale',
        'body.0.body.0.conv.att.2.dwc.weight',
        'body.0.body.0.conv.att.2.proj.weight',
        'body.0.body.0.conv.conv.alpha1',
        'body.0.body.0.conv.conv.conv1x1.weight',
        'body.0.body.0.conv.conv.conv3x3.weight',
        'body.0.body.0.conv.conv.conv5x5.weight',
        'body.0.body.0.conv.conv.conv5x5_reparam.weight',
        'body.0.body.0.conv.aggr.0.weight',
        'body.0.body.0.fc2.weight',
        'to_img.MetaUpsample',
    ),
    load_fn=_load,
)
