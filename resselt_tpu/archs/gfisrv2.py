"""GFISRV2 — gated Fourier-inception SR v2.

Parity with resselt/archs/gfisrv2/{__init__.py,arch.py}: RMSNorm-normalized
FourierUnit (block real/imag channel layout with the reference's
pair-reinterpretation on reassembly, arch.py:472-497), rotating 4-branch
InceptionDWConv2d with a FourierUnit branch, SiLU gated blocks,
UniUpsampleV3 tail.
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
class GFISRV2Config:
    in_nc: int
    out_nc: int
    dim: int
    expansion_ratio: float
    scale: int
    upsampler: str
    mid_dim: int
    pixel_unshuffle: bool
    n_blocks: int


def _rms(p: PTree, name: str, x):
    return F.rms_norm_ref(x, p[f'{name}.scale'], p[f'{name}.offset'])


def fourier_unit_v2(p: PTree, x):
    """FourierUnit v2 (gfisrv2/arch.py:449-497); x NHWC.

    real/imag are stacked block-wise on the channel dim [r0..r_{c-1},
    i0..i_{c-1}] and the complex reassembly pairs *consecutive channels*
    (a reference quirk, replicated exactly)."""
    b, h, w, c = x.shape
    orig_dtype = x.dtype
    fre, fim = spectral.rfft2_planes(x.astype(jnp.float32).transpose(0, 3, 1, 2), norm='ortho')
    wf = fre.shape[-1]
    ff = jnp.concatenate([fre, fim], axis=1)  # (b, 2c, h, w') block layout
    ff = ff.transpose(0, 2, 3, 1).astype(orig_dtype)  # NHWC

    ff = _rms(p, 'rn', ff)
    ff = p.conv('fpe', ff, padding=1, groups=2 * c) + ff
    ff = F.gelu(p.conv('fdc', ff))

    # pair consecutive channels as (real, imag)
    ff = ff.reshape(b, h, wf, c, 2).astype(jnp.float32)
    out = spectral.irfft2_planes(
        ff[..., 0].transpose(0, 3, 1, 2), ff[..., 1].transpose(0, 3, 1, 2),
        s=(h, w), norm='ortho',
    ).transpose(0, 2, 3, 1).astype(orig_dtype)
    return _rms(p, 'post_norm', out)


def _inception_v2(p: PTree, x, gc: int, shift: int):
    """Rotating 4-branch InceptionDWConv2d (gfisrv2/arch.py:499-580)."""
    c = x.shape[-1]
    names = ['pconv', 'dwconv_hw', 'dwconv_w', 'dwconv_h']
    base_sizes = [c - 3 * gc, gc, gc, gc]

    def op_for(slot: int, name: str, t):
        if slot == 0:
            return fourier_unit_v2(p.sub(name), t)
        if slot == 1:
            return p.conv(name, t, padding=1, groups=gc)
        if slot == 2:
            kb = p[f'{name}.weight'].shape[-1]
            return p.conv(name, t, padding=(0, kb // 2), groups=gc)
        kb = p[f'{name}.weight'].shape[-2]
        return p.conv(name, t, padding=(kb // 2, 0), groups=gc)

    parts = []
    start = 0
    for offset, name in enumerate(names):
        slot = (shift + offset) % 4
        size = base_sizes[slot]
        t = x[..., start : start + size]
        start += size
        parts.append(op_for(slot, name, t))
    return jnp.concatenate(parts, axis=-1)


def _gated_block(p: PTree, x, cfg: GFISRV2Config, shift: int):
    """GatedCNNBlock v2 (gfisrv2/arch.py:582-628): SiLU activations."""
    shortcut = x
    x = _rms(p, 'norm', x)
    hidden = int(cfg.expansion_ratio * cfg.dim)
    x = p.conv('fc1', x, padding=1)
    g = x[..., :hidden]
    i = x[..., hidden : 2 * hidden - cfg.dim]
    c = x[..., 2 * hidden - cfg.dim :]
    gc = int(cfg.dim * 0.125)
    c = _inception_v2(p.sub('conv'), c, gc, shift)
    x = F.silu(p.conv('fc2', F.silu(g) * jnp.concatenate([i, c], axis=-1), padding=1))
    return x * p['gamma'].reshape(-1).astype(x.dtype) + shortcut


def apply(cfg: GFISRV2Config, params, x):
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
        out = _gated_block(p.sub(f'gfisr_body.{i}'), out, cfg, i)
    out = F.silu(p.conv(f'gfisr_body.{cfg.n_blocks}', out, padding=1))
    out = p.conv(f'gfisr_body.{cfg.n_blocks + 2}', out, padding=1)
    out = out + feat

    out = uni_upsample_v3(p.sub('upscale'), out, cfg.upsampler, up_scale, cfg.out_nc, cfg.mid_dim, dysample_end_kernel=3)
    return out[:, : h0 * cfg.scale, : w0 * cfg.scale]


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/gfisrv2/__init__.py:36-73)."""
    meta_buf = [int(v) for v in sd['upscale.MetaUpsample'].reshape(-1)]
    _, upsampler_idx, scale, dim, out_ch, mid_dim, _ = meta_buf
    upsampler = SAMPLE_MODS3[upsampler_idx]
    n_blocks = get_seq_len(sd, 'gfisr_body') - 3
    expansion_ratio = sd['gfisr_body.0.fc1.weight'].shape[0] // 2 / dim
    if 'in_to_dim.weight' in sd:
        pixel_unshuffle = False
        in_nc = sd['in_to_dim.weight'].shape[1]
    else:
        stem_cin = sd['in_to_dim.1.weight'].shape[1]
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

    cfg = GFISRV2Config(
        in_nc=in_nc, out_nc=out_ch, dim=dim, expansion_ratio=expansion_ratio,
        scale=scale, upsampler=upsampler, mid_dim=mid_dim,
        pixel_unshuffle=pixel_unshuffle, n_blocks=n_blocks,
    )
    params = {k: v for k, v in sd.items() if k != 'upscale.MetaUpsample'}
    meta = ModelMetadata(in_channels=in_nc, out_channels=out_ch, upscale=scale, name='GFISRV2')
    return SRModel('GFISRV2', cfg, params, meta, apply)


ARCH = Architecture(
    id='GFISRV2',
    detect_condition=KeyCondition.has_all(
        'gfisr_body.0.gamma',
        'gfisr_body.0.norm.scale',
        'gfisr_body.0.norm.offset',
        'gfisr_body.0.fc1.weight',
        'gfisr_body.0.fc1.bias',
        'gfisr_body.0.conv.pconv.rn.scale',
        'gfisr_body.0.conv.pconv.rn.offset',
        'gfisr_body.0.conv.pconv.post_norm.scale',
        'gfisr_body.0.conv.pconv.post_norm.offset',
        'gfisr_body.0.conv.pconv.fdc.weight',
        'gfisr_body.0.conv.pconv.fdc.bias',
        'gfisr_body.0.conv.pconv.fpe.weight',
        'gfisr_body.0.conv.pconv.fpe.bias',
        'gfisr_body.0.conv.dwconv_hw.weight',
        'gfisr_body.0.conv.dwconv_hw.bias',
        'gfisr_body.0.conv.dwconv_w.weight',
        'gfisr_body.0.conv.dwconv_w.bias',
        'gfisr_body.0.conv.dwconv_h.weight',
        'gfisr_body.0.conv.dwconv_h.bias',
        'gfisr_body.0.fc2.weight',
        'gfisr_body.0.fc2.bias',
        'upscale.MetaUpsample',
    ),
    load_fn=_load,
)
