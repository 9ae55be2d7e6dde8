"""GFISR — gated Fourier-inception SR.

Parity with resselt/archs/gfisr/{__init__.py,arch.py}: FourierUnit (ortho
rfft2 -> channel LN -> dynamic grouped 1x1 -> softmax-weighted group mix ->
irfft2, f32-forced, eval-time +2 halo pad), rotating 5-branch
InceptionDWConv2d, UniUpsampleV3 tail, PadPixelUnshuffle input for 1x/2x.

Deviations: detection accepts the pixel-unshuffle stem
('in_to_dim.1.weight'), which the reference fingerprint rejects even though
its loader handles it; for those checkpoints the real scale is recovered
(the reference rebuilds with the MetaUpsample scale 4 and fails to load).
"""

from __future__ import annotations

import math

from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn import spectral
from ..nn.params import PTree
from ..nn.upsample import SAMPLE_MODS3, uni_upsample_v3


@dataclass(frozen=True)
class GFISRConfig:
    in_nc: int
    out_nc: int
    dim: int
    expansion_ratio: float
    fft_mode: bool
    scale: int
    upsampler: str
    mid_dim: int
    pixel_unshuffle: bool
    n_blocks: int


def fourier_unit(p: PTree, x):
    """FourierUnit eval path (gfisr/arch.py:416-472); x NHWC."""
    b, h0, w0, c = x.shape
    # eval: expand_all_sides pad + evenness (arch.py:385-410)
    pr = (w0 + 4) % 2
    pb = (h0 + 4) % 2
    x = F.pad2d(x, (2, 2 + pr, 2, 2 + pb), mode='reflect')
    h, w = x.shape[1], x.shape[2]

    orig_dtype = x.dtype
    fre, fim = spectral.rfft2_planes(x.astype(jnp.float32).transpose(0, 3, 1, 2), norm='ortho')
    wf = fre.shape[-1]
    # interleave real/imag per channel: (b, h, w', 2c) with channel = c*2 + d
    ff = jnp.stack([fre, fim], axis=2)  # (b, c, 2, h, w')
    ff = ff.reshape(b, 2 * c, h, wf).transpose(0, 2, 3, 1).astype(orig_dtype)

    ff = F.layer_norm(ff, p['ln.weight'], p['ln.bias'], eps=1e-6)
    ff = p.conv('fpe', ff, padding=1, groups=2 * c) + ff

    dyw = F.softmax(p.conv('weight.0', ff), axis=-1)  # (b, h, w', groups)
    groups = dyw.shape[-1]
    fdc = p.conv('fdc', ff, groups=groups)  # (b, h, w', 2c*groups)
    fdc = fdc.reshape(b, h, wf, groups, 2 * c)
    ff = jnp.einsum('bhwgc,bhwg->bhwc', fdc, dyw, preferred_element_type=jnp.float32).astype(orig_dtype)
    ff = F.gelu(ff)

    ff = ff.reshape(b, h, wf, c, 2)
    out = spectral.irfft2_planes(
        ff[..., 0].transpose(0, 3, 1, 2), ff[..., 1].transpose(0, 3, 1, 2),
        s=(h, w), norm='ortho',
    )
    out = out.transpose(0, 2, 3, 1).astype(orig_dtype)
    # unpad
    return out[:, 2 : h - 2 - pb, 2 : w - 2 - pr, :]


def _inception_shift(p: PTree, x, gc: int, shift: int, fft_mode: bool):
    """Rotating InceptionDWConv2d (gfisr/arch.py:474-539)."""
    c = x.shape[-1]
    names = ['pconv', 'dwconv_hw', 'dwconv_w', 'dwconv_h', 'fsas']
    base_sizes = [c - 4 * gc, gc, gc, gc, gc]

    def op_for(slot: int, name: str, t):
        # slot = (shift + offset) % 5 selects the canonical op list entry
        if slot == 0:  # identity
            return t
        if slot == 1:
            return p.conv(name, t, padding=1, groups=gc)
        if slot == 2:
            kb = p[f'{name}.weight'].shape[-1]
            return p.conv(name, t, padding=(0, kb // 2), groups=gc)
        if slot == 3:
            kb = p[f'{name}.weight'].shape[-2]
            return p.conv(name, t, padding=(kb // 2, 0), groups=gc)
        return fourier_unit(p.sub(name), t) if fft_mode else t

    parts = []
    start = 0
    for offset, name in enumerate(names):
        slot = (shift + offset) % 5
        size = base_sizes[slot]
        t = x[..., start : start + size]
        start += size
        parts.append(op_for(slot, name, t))
    return jnp.concatenate(parts, axis=-1)


def _gated_block(p: PTree, x, cfg: GFISRConfig, shift: int):
    """GatedCNNBlock (gfisr/arch.py:541-578)."""
    shortcut = x
    x = F.layer_norm(x, p['norm.weight'], p['norm.bias'], eps=1e-6)
    hidden = int(cfg.expansion_ratio * cfg.dim)
    x = p.conv('fc1', x, padding=1)
    g = x[..., :hidden]
    i = x[..., hidden : 2 * hidden - cfg.dim]
    c = x[..., 2 * hidden - cfg.dim :]
    gc = int(cfg.dim * 0.125)
    c = _inception_shift(p.sub('conv'), c, gc, shift, cfg.fft_mode)
    x = F.mish(p.conv('fc2', F.mish(g) * jnp.concatenate([i, c], axis=-1), padding=1))
    return x * p['gamma'].reshape(-1).astype(x.dtype) + shortcut


def apply(cfg: GFISRConfig, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    if cfg.pixel_unshuffle and cfg.scale in (1, 2):
        down = 4 // cfg.scale
        x = F.pad_to_multiple(x, down, mode='reflect')
        x = F.pixel_unshuffle(x, down)
        feat = p.conv('in_to_dim.1', x, padding=1)
        up_scale = 4
    else:
        feat = p.conv('in_to_dim', x, padding=1)
        up_scale = cfg.scale

    out = feat
    for i in range(cfg.n_blocks):
        out = _gated_block(p.sub(f'net.{i}'), out, cfg, i)
    out = out + feat

    out = uni_upsample_v3(p.sub('dim_to_out'), out, cfg.upsampler, up_scale, cfg.out_nc, cfg.mid_dim, dysample_end_kernel=3)
    return out[:, : h0 * cfg.scale, : w0 * cfg.scale]


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/gfisr/__init__.py:31-62)."""
    meta_buf = [int(v) for v in sd['dim_to_out.MetaUpsample'].reshape(-1)]
    _, index, scale, _, out_ch, upsample_dim, _ = meta_buf
    upsampler = SAMPLE_MODS3[index]
    fft_mode = 'net.0.conv.fsas.ln.weight' in sd

    if 'in_to_dim.weight' in sd:
        dim, in_nc = sd['in_to_dim.weight'].shape[:2]
        pixel_unshuffle = False
    else:
        dim, stem_cin = sd['in_to_dim.1.weight'].shape[:2]
        if stem_cin % out_ch == 0 and math.isqrt(stem_cin // out_ch) ** 2 == stem_cin // out_ch \
                and math.isqrt(stem_cin // out_ch) in (2, 4):
            # stem cin = in_nc * (4 // scale)^2 with in_nc == out_ch for
            # every constructible checkpoint — disambiguates 4-channel
            # scale-2 (cin 16) from 1-channel scale-1 (also cin 16), which
            # the reference's bare %16 heuristic misclassifies
            down = math.isqrt(stem_cin // out_ch)
            in_nc = out_ch
            scale = 4 // down
        elif stem_cin % 16 == 0:
            in_nc = stem_cin // 16
            scale = 1
        else:
            in_nc = stem_cin // 4
            scale = 2
        pixel_unshuffle = True
    n_blocks = get_seq_len(sd, 'net')
    expansion_ratio = sd['net.0.fc1.bias'].shape[0] / 2 / dim

    cfg = GFISRConfig(
        in_nc=in_nc, out_nc=out_ch, dim=dim, expansion_ratio=expansion_ratio,
        fft_mode=fft_mode, scale=scale, upsampler=upsampler, mid_dim=upsample_dim,
        pixel_unshuffle=pixel_unshuffle, n_blocks=n_blocks,
    )
    params = {k: v for k, v in sd.items() if k != 'dim_to_out.MetaUpsample'}
    meta = ModelMetadata(in_channels=in_nc, out_channels=out_ch, upscale=scale, name='GFISR')
    return SRModel('GFISR', cfg, params, meta, apply)


ARCH = Architecture(
    id='GFISR',
    detect_condition=KeyCondition.has_all(
        KeyCondition.has_any('in_to_dim.weight', 'in_to_dim.1.weight'),
        'net.0.gamma',
        'net.0.norm.weight',
        'net.0.norm.bias',
        'net.0.fc1.weight',
        'net.0.fc1.bias',
        'net.0.conv.dwconv_hw.weight',
        'net.0.conv.dwconv_hw.bias',
        'net.0.conv.dwconv_w.weight',
        'net.0.conv.dwconv_w.bias',
        'net.0.conv.dwconv_h.weight',
        'net.0.conv.dwconv_h.bias',
        'net.0.fc2.weight',
        'net.0.fc2.bias',
        'dim_to_out.MetaUpsample',
    ),
    load_fn=_load,
)
