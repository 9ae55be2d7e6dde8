"""FIGSR — Fourier Inception Gated Super Resolution.

Parity with resselt/archs/figsr/{__init__.py,arch.py}: FourierUnit with the
serialized-eps RMSNorm (eps/rms stored as buffers, arch.py:398-409), full
(ungrouped) inception convs, built-in 4px halo pad with crop_extra
(arch.py:682-706), learnable global shift/scale_norm affine, UniUpsampleV3
tail.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn import spectral
from ..nn.params import PTree
from ..nn.upsample import SAMPLE_MODS3, uni_upsample_v3


@dataclass(frozen=True)
class FIGSRConfig:
    in_nc: int
    out_nc: int
    dim: int
    expansion_ratio: float
    scale: int
    upsampler: str
    mid_dim: int
    n_blocks: int
    gc: int
    square_kernel_size: int
    band_kernel_size: int


def _rms(p: PTree, name: str, x):
    """FIGSR RMSNorm: norm = eps + ||x||_ch * rms, with eps/rms from the
    checkpoint (figsr/arch.py:398-409)."""
    eps = p[f'{name}.eps'].astype(x.dtype).reshape(())
    rms = p[f'{name}.rms'].astype(x.dtype).reshape(())
    norm = eps + jnp.linalg.norm(x, axis=-1, keepdims=True) * rms
    return p[f'{name}.offset'].astype(x.dtype) + (x / norm) * p[f'{name}.scale'].astype(x.dtype)


def _fourier_unit(p: PTree, x):
    """FourierUnit (figsr/arch.py:520-559): block real/imag layout with
    consecutive-channel complex reassembly (as GFISRV2)."""
    b, h, w, c = x.shape
    orig_dtype = x.dtype
    fre, fim = spectral.rfft2_planes(x.astype(jnp.float32).transpose(0, 3, 1, 2), norm='ortho')
    wf = fre.shape[-1]
    ff = jnp.concatenate([fre, fim], axis=1)
    ff = ff.transpose(0, 2, 3, 1).astype(orig_dtype)

    ff = _rms(p, 'rn', ff)
    ff = p.conv('fpe', ff, padding=1, groups=2 * c) + ff
    ff = F.gelu(p.conv('fdc', ff))

    ff = ff.reshape(b, h, wf, c, 2).astype(jnp.float32)
    out = spectral.irfft2_planes(
        ff[..., 0].transpose(0, 3, 1, 2), ff[..., 1].transpose(0, 3, 1, 2),
        s=(h, w), norm='ortho',
    ).transpose(0, 2, 3, 1).astype(orig_dtype)
    return _rms(p, 'post_norm', out)


def _gated_block(p: PTree, x, cfg: FIGSRConfig):
    """GatedCNNBlock (figsr/arch.py:593-624)."""
    shortcut = x
    dim, gc = cfg.dim, cfg.gc
    hidden = int(cfg.expansion_ratio * dim) // 8 * 8
    x = _rms(p, 'norm', x)
    x = p.conv('fc1', x, padding=1)
    g = x[..., :hidden]
    i = x[..., hidden : 2 * hidden - dim]
    o = 2 * hidden - dim
    c = x[..., o : o + dim - 3 * gc]
    c_hw = x[..., o + dim - 3 * gc : o + dim - 2 * gc]
    c_w = x[..., o + dim - 2 * gc : o + dim - gc]
    c_h = x[..., o + dim - gc :]

    c = _fourier_unit(p.sub('conv.fu'), c)
    c_hw = p.conv('conv.convhw', c_hw, padding=cfg.square_kernel_size // 2)
    c_w = p.conv('conv.convw', c_w, padding=(0, cfg.band_kernel_size // 2))
    c_h = p.conv('conv.convh', c_h, padding=(cfg.band_kernel_size // 2, 0))

    x = p.conv('fc2', F.silu(g) * jnp.concatenate([i, c, c_hw, c_w, c_h], axis=-1), padding=1)
    return x + shortcut


def apply(cfg: FIGSRConfig, params, x):
    p = PTree(params)
    shift = p['shift'].reshape(-1).astype(x.dtype)
    scale_norm = p['scale_norm'].reshape(-1).astype(x.dtype)
    x = (x - shift) / scale_norm

    h0, w0 = x.shape[1], x.shape[2]
    extra = 4
    h2, w2 = h0 + 2 * extra, w0 + 2 * extra
    mod_pad_h = (2 - h2 % 2) % 2
    mod_pad_w = (2 - w2 % 2) % 2
    x = F.pad2d(x, (extra, extra + mod_pad_w, extra, extra + mod_pad_h), mode='reflect')

    x = p.conv('in_to_dim', x, padding=1)
    n_half = cfg.n_blocks // 2
    x0 = x
    for i in range(n_half):
        x0 = _gated_block(p.sub(f'gfisr_body_half.{i}'), x0, cfg)
    x1 = x0
    for i in range(cfg.n_blocks - n_half):
        x1 = _gated_block(p.sub(f'gfisr_body_half_2.{i}'), x1, cfg)
    x1 = p.conv(f'gfisr_body_half_2.{cfg.n_blocks - n_half}', x1, padding=1)

    x = p.conv('cat_to_dim', jnp.concatenate([x1, x, x0], axis=-1))
    x = uni_upsample_v3(p.sub('upscale'), x, cfg.upsampler, cfg.scale, cfg.out_nc, cfg.mid_dim, dysample_end_kernel=3)
    ce = extra * cfg.scale
    x = x[:, ce : ce + h0 * cfg.scale, ce : ce + w0 * cfg.scale, :]
    return x * scale_norm + shift


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/figsr/__init__.py:73-109)."""
    meta_buf = [int(v) for v in sd['upscale.MetaUpsample'].reshape(-1)]
    _, upsampler_idx, scale, dim, out_nc, mid_dim, _ = meta_buf
    upsampler = SAMPLE_MODS3[upsampler_idx]
    dim, in_nc = sd['in_to_dim.weight'].shape[:2]
    expansion_ratio = sd['gfisr_body_half.0.fc1.weight'].shape[0] / 2 / dim
    n_blocks = get_seq_len(sd, 'gfisr_body_half')
    n_blocks += get_seq_len(sd, 'gfisr_body_half_2') - 1
    gc = sd['gfisr_body_half.0.conv.convh.bias'].shape[0]
    square_kernel_size = sd['gfisr_body_half.0.conv.convhw.weight'].shape[2]
    band_kernel_size = sd['gfisr_body_half.0.conv.convh.weight'].shape[2]

    cfg = FIGSRConfig(
        in_nc=in_nc, out_nc=out_nc, dim=dim, expansion_ratio=expansion_ratio,
        scale=scale, upsampler=upsampler, mid_dim=mid_dim, n_blocks=n_blocks,
        gc=gc, square_kernel_size=square_kernel_size, band_kernel_size=band_kernel_size,
    )
    params = {k: v for k, v in sd.items() if k != 'upscale.MetaUpsample'}
    meta = ModelMetadata(in_channels=in_nc, out_channels=in_nc, upscale=scale, name='FIGSR')
    return SRModel('FIGSR', cfg, params, meta, apply)


ARCH = Architecture(
    id='FIGSR',
    detect_condition=KeyCondition.has_all(
        'in_to_dim.weight',
        'in_to_dim.bias',
        'gfisr_body_half.0.norm.scale',
        'gfisr_body_half.0.norm.offset',
        'gfisr_body_half.0.norm.eps',
        'gfisr_body_half.0.norm.rms',
        'gfisr_body_half.0.fc1.weight',
        'gfisr_body_half.0.fc1.bias',
        'gfisr_body_half.0.conv.fu.rn.scale',
        'gfisr_body_half.0.conv.fu.rn.offset',
        'gfisr_body_half.0.conv.fu.rn.eps',
        'gfisr_body_half.0.conv.fu.rn.rms',
        'gfisr_body_half.0.conv.fu.post_norm.scale',
        'gfisr_body_half.0.conv.fu.post_norm.offset',
        'gfisr_body_half.0.conv.fu.post_norm.eps',
        'gfisr_body_half.0.conv.fu.post_norm.rms',
        'gfisr_body_half.0.conv.fu.fdc.weight',
        'gfisr_body_half.0.conv.fu.fdc.bias',
        'gfisr_body_half.0.conv.fu.fpe.weight',
        'gfisr_body_half.0.conv.fu.fpe.bias',
        'gfisr_body_half.0.conv.convhw.weight',
        'gfisr_body_half.0.conv.convhw.bias',
        'gfisr_body_half.0.conv.convw.weight',
        'gfisr_body_half.0.conv.convw.bias',
        'gfisr_body_half.0.conv.convh.weight',
        'gfisr_body_half.0.conv.convh.bias',
        'gfisr_body_half.0.fc2.weight',
        'gfisr_body_half.0.fc2.bias',
        'gfisr_body_half_2.0.norm.scale',
        'gfisr_body_half_2.0.norm.offset',
        'gfisr_body_half_2.0.norm.eps',
        'gfisr_body_half_2.0.norm.rms',
        'gfisr_body_half_2.0.fc1.weight',
        'gfisr_body_half_2.0.fc1.bias',
        'gfisr_body_half_2.0.conv.fu.rn.scale',
        'gfisr_body_half_2.0.conv.fu.rn.offset',
        'gfisr_body_half_2.0.conv.fu.rn.eps',
        'gfisr_body_half_2.0.conv.fu.rn.rms',
        'gfisr_body_half_2.0.conv.fu.post_norm.scale',
        'gfisr_body_half_2.0.conv.fu.post_norm.offset',
        'gfisr_body_half_2.0.conv.fu.post_norm.eps',
        'gfisr_body_half_2.0.conv.fu.post_norm.rms',
        'gfisr_body_half_2.0.conv.fu.fdc.weight',
        'gfisr_body_half_2.0.conv.fu.fdc.bias',
        'gfisr_body_half_2.0.conv.fu.fpe.weight',
        'gfisr_body_half_2.0.conv.fu.fpe.bias',
        'gfisr_body_half_2.0.conv.convhw.weight',
        'gfisr_body_half_2.0.conv.convhw.bias',
        'gfisr_body_half_2.0.conv.convw.weight',
        'gfisr_body_half_2.0.conv.convw.bias',
        'gfisr_body_half_2.0.conv.convh.weight',
        'gfisr_body_half_2.0.conv.convh.bias',
        'gfisr_body_half_2.0.fc2.weight',
        'gfisr_body_half_2.0.fc2.bias',
        'cat_to_dim.weight',
        'cat_to_dim.bias',
        'upscale.MetaUpsample',
    ),
    load_fn=_load,
)
