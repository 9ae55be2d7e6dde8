"""LAWFFT — Local Adaptive Weighted Fourier Feature Transformer.

Parity with resselt/archs/lawfft/{__init__.py,arch.py}: FSAS
frequency-domain attention (rfft2 correlation, whole-map on even blocks,
8x8 patch-wise on odd blocks), DynamicLocal per-sample generated depthwise
kernels, gated FFN, UniUpsample tail.

Deviation: for unshuffle checkpoints the reference loader feeds the
MetaUpsample scale (4) back into the constructor, which then builds the
wrong stem and fails to load (lawfft/arch.py:394-404); we recover the real
scale from the stem conv shape.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn import spectral
from ..nn.params import PTree
from ..nn.upsample import SAMPLE_MODS, uni_upsample


@dataclass(frozen=True)
class LAWFFTConfig:
    in_ch: int
    dim: int
    split: float
    scale: int
    n_rblock: int
    n_mblock: int
    t_mid_factor: float
    window_size: int
    mlp_factor: float
    unshuffle_mod: bool
    unshuffle: int
    upsampler: str
    mid_dim: int


def _ln_ch(p: PTree, name: str, x):
    return F.layer_norm(x, p[f'{name}.weight'], p[f'{name}.bias'], eps=1e-6)


def dynamic_local(p: PTree, x, k: int):
    """DynamicLocal (lawfft/arch.py:220-243): per-sample generated depthwise
    kernels applied via a grouped conv with batch folded into channels."""
    b, h, w, c = x.shape
    g = jnp.mean(x, axis=(1, 2), keepdims=True)
    g = F.relu(p.conv('kernel_gen.1', g))
    kern = p.conv('kernel_gen.3', g)  # (b, 1, 1, c*k*k)
    # torch layout: channel = c_idx * k*k + ki (C-major); reshape to (b*c, 1, k, k)
    kern = kern.reshape(b, c, k, k).reshape(b * c, 1, k, k)
    x_ = x.transpose(0, 3, 1, 2).reshape(1, b * c, h, w).transpose(0, 2, 3, 1)  # (1, h, w, b*c)
    out = F.conv2d(x_, kern, padding=k // 2, groups=b * c)
    return out.transpose(0, 3, 1, 2).reshape(b, c, h, w).transpose(0, 2, 3, 1)


def _fsas(p: PTree, x, mid_factor: float, patch_size: int, windowed: bool):
    """FSAS (lawfft/arch.py:245-307); x: NHWC."""
    b, h, w, c = x.shape
    hidden = p.conv('to_hidden', x)
    mid = hidden.shape[-1]
    hidden = p.conv('to_hidden_dw', hidden, padding=1, groups=mid)
    third = mid // 3
    q, k, v = hidden[..., :third], hidden[..., third : 2 * third], hidden[..., 2 * third :]

    # fft over spatial dims; data is NHWC so move C before the fft axes
    qf = q.transpose(0, 3, 1, 2).astype(jnp.float32)
    kf = k.transpose(0, 3, 1, 2).astype(jnp.float32)
    def corr(qf, kf, s):
        qr, qi = spectral.rfft2_planes(qf)
        kr, ki = spectral.rfft2_planes(kf)
        return spectral.irfft2_planes(qr * kr - qi * ki, qr * ki + qi * kr, s=s)

    if windowed:
        ps = patch_size
        qf = qf.reshape(b, third, h // ps, ps, w // ps, ps).transpose(0, 1, 2, 4, 3, 5)
        kf = kf.reshape(b, third, h // ps, ps, w // ps, ps).transpose(0, 1, 2, 4, 3, 5)
        out = corr(qf, kf, (ps, ps))
        out = out.transpose(0, 1, 2, 4, 3, 5).reshape(b, third, h, w)
    else:
        out = corr(qf, kf, (h, w))
    out = out.transpose(0, 2, 3, 1).astype(x.dtype)
    out = _ln_ch(p, 'norm', out)
    return p.conv('project_out', v * out)


def _sfsas(p: PTree, x, cfg: LAWFFTConfig, windowed: bool):
    """SFSAS (lawfft/arch.py:310-331)."""
    local = int(cfg.split * cfg.dim)
    x1, x2 = x[..., :local], x[..., local:]
    x1 = dynamic_local(p.sub('local.0'), x1, 3)
    x1 = dynamic_local(p.sub('local.1'), x1, 5)
    x2 = _fsas(p.sub('att'), x2, cfg.t_mid_factor, cfg.window_size, windowed)
    return p.conv('last', jnp.concatenate([x1, x2], axis=-1))


def _feed_forward(p: PTree, x):
    """Gated conv FFN (lawfft/arch.py:173-200)."""
    x = p.conv('project_in', x)
    hid2 = x.shape[-1]
    x = p.conv('dwconv', x, padding=1, groups=hid2)
    half = hid2 // 2
    return p.conv('project_out', F.gelu(x[..., :half]) * x[..., half:])


def _meta_block(p: PTree, x, cfg: LAWFFTConfig, windowed: bool):
    y = _ln_ch(p, 'token_mix.0', x)
    x = _sfsas(p.sub('token_mix.1'), y, cfg, windowed) + x
    y = _ln_ch(p, 'channel_mix1.0', x)
    return _feed_forward(p.sub('channel_mix1.1'), y) + x


def apply(cfg: LAWFFTConfig, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    pad = cfg.window_size * (cfg.unshuffle if cfg.unshuffle_mod else 1)
    x = F.pad_to_multiple(x, pad, mode='reflect')

    if cfg.unshuffle_mod:
        x = F.pixel_unshuffle(x, cfg.unshuffle)
        feat = p.conv('in_to_dim.1', x, padding=1)
        up_scale = 4
    else:
        feat = p.conv('in_to_dim', x, padding=1)
        up_scale = cfg.scale

    out = feat
    for ri in range(cfg.n_rblock):
        rp = p.sub(f'body.{ri}')
        y = out
        for mi in range(cfg.n_mblock):
            y = _meta_block(rp.sub(f'residual.{mi}'), y, cfg, bool(mi % 2))
        y = dynamic_local(rp.sub(f'residual.{cfg.n_mblock}'), y, 3)
        out = y + out
    out = out + feat

    out = uni_upsample(p.sub('upscale'), out, cfg.upsampler, up_scale, cfg.in_ch, cfg.mid_dim)
    return out[:, : h0 * cfg.scale, : w0 * cfg.scale]


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/lawfft/__init__.py:46-74)."""
    meta_buf = [int(v) for v in sd['upscale.MetaUpsample'].reshape(-1)]
    _, upsampler_idx, scale, dim, in_ch, mid_dim, _ = meta_buf
    upsampler = SAMPLE_MODS[upsampler_idx]
    unshuffle_mod = 'in_to_dim.1.weight' in sd
    unshuffle = 1
    if unshuffle_mod:
        unshuffle = math.isqrt(sd['in_to_dim.1.weight'].shape[1] // in_ch)
        scale = 4 // unshuffle
    window_size = int(np.asarray(sd['window_size']).reshape(-1)[0])
    local_dim = sd['body.0.residual.0.token_mix.1.local.0.kernel_gen.1.bias'].shape[0]
    split = 1 / (dim / local_dim)
    n_rblock = get_seq_len(sd, 'body')
    n_mblock = get_seq_len(sd, 'body.0.residual') - 1
    global_dim = dim - int(dim * split)
    t_mid_factor = sd['body.0.residual.1.token_mix.1.att.to_hidden.bias'].shape[0] / global_dim / 3
    mlp_factor = sd['body.0.residual.1.channel_mix1.1.project_in.bias'].shape[0] / dim / 2

    cfg = LAWFFTConfig(
        in_ch=in_ch, dim=dim, split=split, scale=scale, n_rblock=n_rblock,
        n_mblock=n_mblock, t_mid_factor=t_mid_factor, window_size=window_size,
        mlp_factor=mlp_factor, unshuffle_mod=unshuffle_mod, unshuffle=unshuffle,
        upsampler=upsampler, mid_dim=mid_dim,
    )
    params = {k: v for k, v in sd.items() if k not in ('upscale.MetaUpsample', 'window_size')}
    meta = ModelMetadata(in_channels=in_ch, out_channels=in_ch, upscale=scale, name='LAWFFT')
    return SRModel('LAWFFT', cfg, params, meta, apply)


ARCH = Architecture(
    id='LAWFFT',
    detect_condition=KeyCondition.has_all(
        KeyCondition.has_any('in_to_dim.weight', 'in_to_dim.1.weight'),
        'body.0.residual.0.token_mix.0.weight',
        'body.0.residual.0.token_mix.0.bias',
        'body.0.residual.0.token_mix.1.local.0.kernel_gen.1.weight',
        'body.0.residual.0.token_mix.1.local.0.kernel_gen.1.bias',
        'body.0.residual.0.token_mix.1.local.0.kernel_gen.3.weight',
        'body.0.residual.0.token_mix.1.local.0.kernel_gen.3.bias',
        'body.0.residual.0.token_mix.1.local.1.kernel_gen.1.weight',
        'body.0.residual.0.token_mix.1.local.1.kernel_gen.1.bias',
        'body.0.residual.0.token_mix.1.local.1.kernel_gen.3.weight',
        'body.0.residual.0.token_mix.1.local.1.kernel_gen.3.bias',
        'body.0.residual.0.token_mix.1.att.to_hidden.weight',
        'body.0.residual.0.token_mix.1.att.to_hidden.bias',
        'body.0.residual.0.token_mix.1.att.to_hidden_dw.weight',
        'body.0.residual.0.token_mix.1.att.to_hidden_dw.bias',
        'body.0.residual.0.token_mix.1.att.project_out.weight',
        'body.0.residual.0.token_mix.1.att.project_out.bias',
        'body.0.residual.0.token_mix.1.att.norm.weight',
        'body.0.residual.0.token_mix.1.att.norm.bias',
        'body.0.residual.0.token_mix.1.last.weight',
        'body.0.residual.0.token_mix.1.last.bias',
        'body.0.residual.0.channel_mix1.0.weight',
        'body.0.residual.0.channel_mix1.0.bias',
        'body.0.residual.0.channel_mix1.1.project_in.weight',
        'body.0.residual.0.channel_mix1.1.project_in.bias',
        'body.0.residual.0.channel_mix1.1.dwconv.weight',
        'body.0.residual.0.channel_mix1.1.dwconv.bias',
        'body.0.residual.0.channel_mix1.1.project_out.weight',
        'body.0.residual.0.channel_mix1.1.project_out.bias',
    ),
    load_fn=_load,
)
