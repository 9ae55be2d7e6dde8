"""EIMN — multi-order large-kernel recursive context network.

Parity with resselt/archs/eimn/{__init__.py,arch.py}: EIMNBlock with
inference-mode BatchNorm2d, MOLRCM dilated depthwise attention, SADFFM
gated FFN with DFFM dual attention, per-stage channels-last LayerNorm.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len, pixelshuffle_scale
from ..nn import functional as F
from ..nn.params import PTree


@dataclass(frozen=True)
class EIMNConfig:
    embed_dims: int
    scale: int
    depths: int
    mlp_ratio: float
    num_stages: int


def _molrcm(p: PTree, x, dim: int):
    """MOLRCM (eimn/arch.py:103-147).

    A fused whole-chain Pallas kernel exists (ops/molrcm.py) but measured
    1.9x SLOWER than this XLA chain on the v5e (12.6 vs 6.7 ms, 256^2 b8
    dim64 f32) — XLA fuses the in-context chain far better than standalone
    per-op microbenches suggested.  It stays opt-in (use_fused_molrcm)."""
    import jax

    from ..ops.molrcm import fused_molrcm, fused_molrcm_enabled, molrcm_supported

    if (fused_molrcm_enabled() and jax.default_backend() != 'cpu'
            and molrcm_supported(dim, x.shape[1], x.shape[2])):
        return fused_molrcm(p, x, dim)

    c1, c2 = int(3 / 8 * dim), int(1 / 8 * dim)
    value = p.conv('proj_value.0', x)
    query = F.gelu(p.conv('proj_query.0', x))
    query = p.conv('region', query, padding=2, groups=dim)
    q1 = p.conv('spatial_1', query[..., :c1], padding=4, dilation=2, groups=c1)
    q2 = query[..., c1 : c1 + c2]
    q3 = p.conv('spatial_2', query[..., c1 + c2 :], padding=9, dilation=3, groups=dim - c1 - c2)
    out = F.silu(p.conv('fusion', jnp.concatenate([q1, q2, q3], axis=-1)))
    return p.conv('out', out * value)


def _dffm(p: PTree, x):
    """DFFM (eimn/arch.py:65-100)."""
    identity = x
    x = F.layer_norm(x, p['norm.weight'], p['norm.bias'], eps=1e-6)
    xg = F.gelu(p.conv('global_reduce', jnp.mean(x, axis=(1, 2), keepdims=True)))
    xl = F.gelu(p.conv('local_reduce', x))
    c_attn = F.sigmoid(p.conv('channel_expand', xg))
    xg_b = jnp.broadcast_to(xg, (x.shape[0], x.shape[1], x.shape[2], xg.shape[-1]))
    s_attn = F.sigmoid(p.conv('spatial_expand', jnp.concatenate([xl, xg_b], axis=-1)))
    return identity * (c_attn * s_attn)


def _sadffm(p: PTree, x, dim: int, mlp_ratio: float):
    """SADFFM (eimn/arch.py:38-62)."""
    hidden = int(dim * mlp_ratio)
    x = p.conv('linear_in', x)
    x = p.conv('SAL', x, padding=1, groups=2 * hidden)
    x1, x2 = x[..., :hidden], x[..., hidden:]
    x = F.gelu(x1) * x2
    x = p.conv('linear_out', x)
    return _dffm(p.sub('DFFM'), x)


def _block(p: PTree, x, cfg: EIMNConfig):
    """EIMNBlock (eimn/arch.py:149-174)."""
    ls1 = p['layer_scale_1'].astype(x.dtype)
    ls2 = p['layer_scale_2'].astype(x.dtype)
    x = x + ls1 * _molrcm(p.sub('attn'), p.batch_norm('norm1', x), cfg.embed_dims)
    return x + ls2 * _sadffm(p.sub('mlp'), p.batch_norm('norm2', x), cfg.embed_dims, cfg.mlp_ratio)


def apply(cfg: EIMNConfig, params, x):
    p = PTree(params)
    x = p.conv('head.0', x, padding=1)
    identity = x
    for i in range(cfg.num_stages):
        for j in range(cfg.depths):
            x = _block(p.sub(f'block{i + 1}.{j}'), x, cfg)
        x = F.layer_norm(x, p[f'norm{i + 1}.weight'], p[f'norm{i + 1}.bias'])
    return F.pixel_shuffle(p.conv('tail.0', identity + x, padding=1), cfg.scale)


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/eimn/__init__.py:65-83)."""
    numbers = [int(m.group(1)) for s in sd.keys() if (m := re.search(r'block(\d+)', s))]
    num_stages = max(numbers)
    depths = get_seq_len(sd, 'block1')
    mr = sd['block1.0.mlp.linear_in.weight'].shape
    mlp_ratio = mr[0] // 2 / mr[1]
    embed_dim = sd['head.0.weight'].shape[0]
    scale = pixelshuffle_scale(sd['tail.0.weight'].shape[0], 3)

    cfg = EIMNConfig(embed_dims=embed_dim, scale=scale, depths=depths, mlp_ratio=mlp_ratio, num_stages=num_stages)
    meta = ModelMetadata(in_channels=3, out_channels=3, upscale=scale, name='EIMN')
    return SRModel('eimn', cfg, dict(sd), meta, apply)


ARCH = Architecture(
    id='eimn',
    detect_condition=KeyCondition.has_all(
        'head.0.weight',
        'tail.0.weight',
        'block1.0.layer_scale_1',
        'block1.0.layer_scale_2',
        'block1.0.norm1.running_mean',
        'block1.0.norm1.running_var',
        'block1.0.attn.region.weight',
        'block1.0.attn.spatial_1.weight',
        'block1.0.attn.spatial_2.weight',
        'block1.0.attn.fusion.weight',
        'block1.0.attn.proj_value.0.weight',
        'block1.0.attn.proj_query.0.weight',
        'block1.0.attn.out.weight',
        'block1.0.norm2.running_mean',
        'block1.0.mlp.linear_in.weight',
        'block1.0.mlp.SAL.weight',
        'block1.0.mlp.linear_out.weight',
        'block1.0.mlp.DFFM.norm.weight',
        'block1.0.mlp.DFFM.global_reduce.weight',
        'block1.0.mlp.DFFM.local_reduce.weight',
        'block1.0.mlp.DFFM.channel_expand.weight',
        'block1.0.mlp.DFFM.spatial_expand.weight',
        'norm1.weight',
        'norm1.bias',
    ),
    load_fn=_load,
)
