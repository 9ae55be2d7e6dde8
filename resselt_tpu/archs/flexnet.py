"""FlexNet — multi-scale windowed linear ViT with linear/meta (U-shaped)
pipelines.

Parity with resselt/archs/flexnet/{__init__.py,arch.py}: LMLTVIT window
attention (full-dim scale, LePE depthwise positional conv), RWKV-style
ChannelMix FFN, OmniShift (bias-free variant, collapsed at load), scalar
``window_size``/``scale_factor`` config buffers.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.reparam import pad_kernel_to
from ..nn.upsample import dysample

_F32_EPS = float(np.finfo(np.float32).eps)


@dataclass(frozen=True)
class FlexNetConfig:
    inp_channels: int
    out_channels: int
    scale: int
    dim: int
    num_blocks: tuple[int, ...]
    window_size: int
    hidden_rate: int
    channel_norm: bool
    pipeline_type: str  # 'linear' | 'meta'
    upsampler: str  # 'ps' | 'dys' | 'n+c'


def flexnet_omnishift_collapse(sd, prefix: str):
    """Bias-free OmniShift with a single alpha vector
    (reference: resselt/archs/flexnet/arch.py:66-130)."""
    a = np.asarray(sd[f'{prefix}.alpha'], np.float64)
    w1 = np.asarray(sd[f'{prefix}.conv1x1.weight'], np.float64)
    w3 = np.asarray(sd[f'{prefix}.conv3x3.weight'], np.float64)
    w5 = np.asarray(sd[f'{prefix}.conv5x5.weight'], np.float64)
    ident = pad_kernel_to(np.ones_like(w1), 5)
    w = a[0] * ident + a[1] * pad_kernel_to(w1, 5) + a[2] * pad_kernel_to(w3, 5) + a[3] * w5
    return w.astype(np.float32)


def _rms(p: PTree, name: str, x):
    return F.rms_norm(x, p[f'{name}.weight'], eps=_F32_EPS)


def _lmltvit(p: PTree, x, h: int, w: int, ws: int, dim: int):
    """LMLTVIT (flexnet/arch.py:137-229); x: (B, N, C)."""
    b, n, c = x.shape
    img = x.reshape(b, h, w, c)
    img = F.conv2d(img, p['omni_shift.conv5x5_reparam.weight'], padding=2, groups=dim)
    windows = img.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)

    qkv = F.linear(windows, p['qkv.weight'], p.get('qkv.bias'))
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]

    # LePE on v windows (hardcoded 8x8 view in the reference, arch.py:171-184)
    v_img = v.reshape(-1, ws, ws, c)
    lepe = F.conv2d(v_img, p['get_v.weight'], p.get('get_v.bias'), padding=1, groups=c)
    lepe = lepe.reshape(-1, ws * ws, c)

    attn = jnp.einsum('bnc,bmc->bnm', q, k, preferred_element_type=jnp.float32).astype(x.dtype) * (c**-0.5)
    attn = F.softmax(attn)
    out = jnp.einsum('bnm,bmc->bnc', attn, v, preferred_element_type=jnp.float32).astype(x.dtype) + lepe
    out = F.linear(out, p['proj.weight'], p.get('proj.bias'))

    out = out.reshape(b, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, n, c)
    return out


def _channel_mix(p: PTree, x, h: int, w: int, dim: int, channel_norm: bool):
    """ChannelMix (flexnet/arch.py:232-263)."""
    b, n, c = x.shape
    img = x.reshape(b, h, w, c)
    img = F.conv2d(img, p['omni_shift.conv5x5_reparam.weight'], padding=2, groups=dim)
    x = img.reshape(b, n, c)
    k = F.linear(x, p['key.weight'])
    k = jnp.square(F.relu(k))
    if channel_norm:
        k = F.rms_norm(k, p['key_norm.weight'], eps=_F32_EPS)
    kv = F.linear(k, p['value.weight'])
    return F.sigmoid(F.linear(x, p['receptance.weight'])) * kv


def _t_block(p: PTree, x, h: int, w: int, cfg: FlexNetConfig, dim: int):
    """TransformerBlock (flexnet/arch.py:266-285)."""
    g1 = p['gamma1'].astype(x.dtype)
    g2 = p['gamma2'].astype(x.dtype)
    x = x + g1 * _lmltvit(p.sub('att'), _rms(p, 'rn1', x), h, w, cfg.window_size, dim)
    x = x + g2 * _channel_mix(p.sub('ffn'), _rms(p, 'rn2', x), h, w, dim, cfg.channel_norm)
    return x


def _conv_block(p: PTree, x):
    """ConvBlock (flexnet/arch.py:43-63); x: NHWC."""
    out1 = F.mish(p.conv('block.0', x, padding=1))
    out1 = F.mish(p.conv('block.2', out1, padding=1))
    return out1 + p.conv('conv11', x)


def _xblock(p: PTree, x_img, n_block: int, cfg: FlexNetConfig):
    """LBlock / MBlock (flexnet/arch.py:288-339); x_img: NHWC."""
    b, h, w, c = x_img.shape
    x = x_img.reshape(b, h * w, c)
    shortcut = x
    for i in range(n_block):
        x = _t_block(p.sub(f't_blocks.{i}'), x, h, w, cfg, c)
    x = jnp.concatenate([shortcut, x], axis=-1).reshape(b, h, w, 2 * c)
    return _conv_block(p.sub('conv'), x)


def apply(cfg: FlexNetConfig, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    pad = cfg.window_size * (8 if cfg.pipeline_type == 'meta' else 1)
    x = F.pad_to_multiple(x, pad, mode='reflect')

    short_cut = _conv_block(p.sub('short_cut'), x)
    x = p.conv('in_to_feat', x, padding=1)

    if cfg.pipeline_type == 'linear':
        for i, nb in enumerate(cfg.num_blocks):
            x = _xblock(p.sub(f'pipeline.att.{i}'), x, nb, cfg)
    else:
        pp = p.sub('pipeline')

        def down(name, t):
            return F.pixel_unshuffle(F.conv2d(t, pp[f'{name}.body.0.weight'], padding=1), 2)

        def up(name, t):
            return F.pixel_shuffle(F.conv2d(t, pp[f'{name}.body.0.weight'], padding=1), 2)

        enc0 = down('down1', _xblock(pp.sub('enc0.0'), x, cfg.num_blocks[0], cfg))
        enc1 = down('down2', _xblock(pp.sub('enc1.0'), enc0, cfg.num_blocks[1], cfg))
        enc2 = down('down3', _xblock(pp.sub('enc2.0'), enc1, cfg.num_blocks[2], cfg))
        enc3 = _xblock(pp.sub('enc3.0'), enc2, cfg.num_blocks[3], cfg)
        y = up('up1', jnp.concatenate([enc3, enc2], axis=-1))
        y = _xblock(pp.sub('dec0.0'), y, cfg.num_blocks[2], cfg)
        y = up('up2', jnp.concatenate([y, enc1], axis=-1))
        y = _xblock(pp.sub('dec1.0'), y, cfg.num_blocks[1], cfg)
        y = up('up3', jnp.concatenate([y, enc0], axis=-1))
        x = _xblock(pp.sub('dec2.0'), y, cfg.num_blocks[0], cfg)

    x = jnp.concatenate([x, short_cut], axis=-1)

    if cfg.upsampler == 'n+c':
        x = p.conv('to_img.0', x, padding=1)
        q = p.sub('to_img.1')
        if (cfg.scale & (cfg.scale - 1)) == 0:
            idx = 0
            for _ in range(int(math.log2(cfg.scale))):
                x = F.leaky_relu(F.interpolate_nearest(q.conv(str(idx), x, padding=1), 2), 0.2)
                idx += 3
            x = F.leaky_relu(q.conv(str(idx), x, padding=1), 0.2)
            x = q.conv(str(idx + 2), x, padding=1)
        else:
            x = F.leaky_relu(F.interpolate_nearest(q.conv('0', x, padding=1), 3), 0.2)
            x = F.leaky_relu(q.conv('3', x, padding=1), 0.2)
            x = q.conv('5', x, padding=1)
    elif cfg.upsampler == 'dys':
        x = dysample(p.sub('to_img'), x, cfg.scale)
    else:
        x = F.pixel_shuffle(p.conv('to_img.0', x, padding=1), cfg.scale)
    return x[:, : h0 * cfg.scale, : w0 * cfg.scale]


def transform_params(sd) -> dict:
    out = {}
    prefixes = sorted({k[: -len('.conv1x1.weight')] for k in sd if k.endswith('.conv1x1.weight')})
    for prefix in prefixes:
        out[f'{prefix}.conv5x5_reparam.weight'] = flexnet_omnishift_collapse(sd, prefix)
    consumed = tuple(p + '.' for p in prefixes)
    for k, v in sd.items():
        if any(k.startswith(c) for c in consumed):
            continue
        out[k] = v
    return out


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/flexnet/__init__.py:28-71)."""
    window_size = int(np.asarray(sd['window_size']).reshape(-1)[0])
    dim, inp_channels = sd['in_to_feat.weight'].shape[:2]
    out_channels = inp_channels

    pipeline_type = 'meta' if 'pipeline.enc0.0.t_blocks.0.gamma1' in sd else 'linear'
    if pipeline_type == 'meta':
        num_blocks = tuple(get_seq_len(sd, f'pipeline.enc{i}.0.t_blocks') for i in range(4))
        hr_shape = sd['pipeline.enc0.0.t_blocks.0.ffn.key.weight'].shape
        channel_norm = 'pipeline.enc0.0.t_blocks.0.ffn.key_norm.weight' in sd
    else:
        n = get_seq_len(sd, 'pipeline.att')
        num_blocks = tuple(get_seq_len(sd, f'pipeline.att.{i}.t_blocks') for i in range(n))
        hr_shape = sd['pipeline.att.0.t_blocks.2.ffn.key.weight'].shape
        channel_norm = 'pipeline.att.0.t_blocks.0.ffn.key_norm.weight' in sd
    hidden_rate = hr_shape[0] // hr_shape[1]

    if 'to_img.1.0.weight' in sd:
        upsampler = 'n+c'
        scale = int(np.asarray(sd['scale_factor']).reshape(-1)[0])
        end_index = get_seq_len(sd, 'to_img.1') - 1
        out_channels = sd[f'to_img.1.{end_index}.weight'].shape[0]
    elif 'to_img.init_pos' in sd:
        upsampler = 'dys'
        out_channels = sd['to_img.end_conv.weight'].shape[0]
        scale = math.isqrt(sd['to_img.offset.weight'].shape[0] // 8)
    else:
        upsampler = 'ps'
        scale = math.isqrt(sd['to_img.0.weight'].shape[0] // out_channels)

    cfg = FlexNetConfig(
        inp_channels=inp_channels, out_channels=out_channels, scale=scale, dim=dim,
        num_blocks=num_blocks, window_size=window_size, hidden_rate=hidden_rate,
        channel_norm=channel_norm, pipeline_type=pipeline_type, upsampler=upsampler,
    )
    params = {k: v for k, v in transform_params(sd).items() if k not in ('window_size', 'scale_factor')}
    meta = ModelMetadata(in_channels=inp_channels, out_channels=out_channels, upscale=scale, name='FlexNet')
    return SRModel('FlexNet', cfg, params, meta, apply)


ARCH = Architecture(
    id='FlexNet',
    detect_condition=KeyCondition.has_all(
        'short_cut.block.0.weight',
        'short_cut.block.0.bias',
        'short_cut.block.2.weight',
        'short_cut.block.2.bias',
        'short_cut.conv11.weight',
        'short_cut.conv11.bias',
        'in_to_feat.weight',
        'in_to_feat.bias',
        KeyCondition.has_any(
            'pipeline.enc0.0.t_blocks.0.gamma1',
            'pipeline.att.0.t_blocks.0.gamma1',
        ),
    ),
    load_fn=_load,
)
