"""SMoSR — Simple MoSR with over-parameterized convs.

Parity with resselt/archs/smosr/{__init__.py,arch.py}: DOConv2d /
ConvNXC bundles collapsed to plain convs at load, SMB tanh-gated blocks,
learnable-identity ``short`` convs, UniUpsampleV4_light (6 modes), fixed
reflect pad 2 with scale*2 output crop (arch.py:451-459).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.reparam import convnxc_collapse, doconv_collapse
from ..nn.upsample import dysample

_V4_MODS = ('conv', 'pixelshuffledirect', 'pixelshuffle', 'nearest+conv', 'dysample', 'pa_up')


@dataclass(frozen=True)
class SMoSRConfig:
    in_ch: int
    out_ch: int
    dim: int
    scale: int
    rep: bool
    n_mb: int
    upsampler: str
    mid_dim: int
    group: int
    d_kernel: int


def _ec(p: PTree, name: str, x, padding='same'):
    """conv via collapsed eval_conv weights."""
    return p.conv(f'{name}.eval_conv', x, padding=padding)


def _smb(p: PTree, x):
    """SMB (smosr/arch.py:379-416)."""
    y = F.silu(_ec(p, 'body.0', x))
    y = F.silu(_ec(p, 'body.2', y))
    y = _ec(p, 'body.4', y)
    c = y.shape[-1] // 2
    out, sim_mo = y[..., :c], y[..., c:]
    if 'short.weight' in p:
        short = p.conv('short', x)
    else:
        short = x
    return (out + short) * jnp.tanh(sim_mo)


def _uni_v4(p: PTree, x, cfg: SMoSRConfig):
    """UniUpsampleV4_light (smosr/arch.py:87-209)."""
    import math

    mode, scale, mid_dim = cfg.upsampler, cfg.scale, cfg.mid_dim
    in_dim = x.shape[-1]
    if scale == 1 or mode == 'conv':
        return _ec(p, '0', x)
    if mode == 'pixelshuffledirect':
        return F.pixel_shuffle(_ec(p, '0', x), scale)
    if mode == 'pixelshuffle':
        x = F.leaky_relu(_ec(p, '0', x), 0.01)
        idx = 2
        if (scale & (scale - 1)) == 0:
            for _ in range(int(math.log2(scale))):
                x = F.pixel_shuffle(_ec(p, str(idx), x), 2)
                idx += 2
        elif scale == 3:
            x = F.pixel_shuffle(_ec(p, str(idx), x), 3)
            idx += 2
        return _ec(p, str(idx), x)
    if mode == 'nearest+conv':
        if (scale & (scale - 1)) == 0:
            idx = 0
            for _ in range(int(math.log2(scale))):
                x = F.leaky_relu(F.interpolate_nearest(_ec(p, str(idx), x), 2), 0.2)
                idx += 3
            x = F.leaky_relu(_ec(p, str(idx), x), 0.2)
            return _ec(p, str(idx + 2), x)
        x = F.leaky_relu(F.interpolate_nearest(_ec(p, '0', x), 3), 0.2)
        x = F.leaky_relu(_ec(p, '3', x), 0.2)
        return _ec(p, '5', x)
    if mode == 'dysample':
        if f'0.eval_conv.weight' in p:
            x = F.leaky_relu(_ec(p, '0', x), 0.01)
            dys = p.sub('2')
        else:
            dys = p.sub('0')
        out = dysample(dys, x, scale, groups=cfg.group, end_convolution=False)
        ek = cfg.d_kernel
        return F.conv2d(out, dys['end_conv.weight'], dys.get('end_conv.bias'), padding=ek // 2)
    if mode == 'pa_up':
        if (scale & (scale - 1)) == 0:
            idx = 0
            for _ in range(int(math.log2(scale))):
                x = F.interpolate_nearest(x, 2)
                x = _ec(p, str(idx + 1), x)
                x = x * F.sigmoid(_ec(p, f'{idx + 2}.conv.0', x))
                x = F.leaky_relu(x, 0.2)
                x = F.leaky_relu(_ec(p, str(idx + 4), x), 0.2)
                idx += 6
            return _ec(p, str(idx), x)
        x = F.interpolate_nearest(x, 3)
        x = _ec(p, '1', x)
        x = x * F.sigmoid(_ec(p, '2.conv.0', x))
        x = F.leaky_relu(x, 0.2)
        x = F.leaky_relu(_ec(p, '4', x), 0.2)
        return _ec(p, '6', x)
    raise ValueError(f'Unknown UniUpsampleV4 mode {mode}')


def apply(cfg: SMoSRConfig, params, x):
    p = PTree(params)
    x = F.pad2d(x, (2, 2, 2, 2), mode='reflect')
    short = p.conv('short', x)
    x = _smb(p.sub('blocks_1.0'), x)
    x = _smb(p.sub('blocks_1.1'), x)
    y = x
    for i in range(cfg.n_mb):
        y = _smb(p.sub(f'blocks_2.{i}'), y)
    x = y + x
    x = _smb(p.sub('end_block.0'), x)
    x = _ec(p.sub('end_block'), '1', x)
    out = _uni_v4(p.sub('upsampler'), jnp.concatenate([short, x], axis=-1), cfg)
    crop = cfg.scale * 2
    return out[:, crop:-crop, crop:-crop, :]


def transform_params(sd) -> dict:
    """Collapse every ConvNXC (identified by .sk.W) then every remaining
    DOConv2d (identified by .W) into eval_conv weights."""
    out = dict(sd)
    convnxc_prefixes = sorted({k[: -len('.sk.W')] for k in sd if k.endswith('.sk.W')})
    consumed = []
    collapsed: set[str] = set()

    def emit(prefix, w, b):
        out[f'{prefix}.eval_conv.weight'] = w
        out[f'{prefix}.eval_conv.bias'] = b
        collapsed.update((f'{prefix}.eval_conv.weight', f'{prefix}.eval_conv.bias'))
        consumed.append(prefix + '.')

    for prefix in convnxc_prefixes:
        emit(prefix, *convnxc_collapse(sd, prefix))
    doconv_prefixes = sorted({
        k[: -len('.W')] for k in sd
        if k.endswith('.W') and not any(k.startswith(c) for c in consumed)
    })
    for prefix in doconv_prefixes:
        emit(prefix, *doconv_collapse(sd, prefix))
    # keep only OUR collapsed outputs under consumed prefixes: rep=True
    # checkpoints also carry the torch modules' stale nested eval_conv
    # buffers (e.g. 'X.conv.0.eval_conv.*' inside a ConvNXC), which a
    # blanket '.eval_conv.' exemption would upload to the device (~5x the
    # needed param memory)
    return {
        k: v for k, v in out.items()
        if k in collapsed or not any(k.startswith(c) for c in consumed)
    }


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/smosr/__init__.py:47-71)."""
    dim, in_ch = sd['blocks_1.0.body.0.eval_conv.weight'].shape[:2]
    n_mb = get_seq_len(sd, 'blocks_2')
    meta_buf = [int(i) for i in sd['upsampler.MetaUpsample'].reshape(-1)]
    _, upsampler_idx, scale, _, out_dim, mid_dim, group, rep = meta_buf
    # DySample sits at 'upsampler.0' when mid_dim == in_dim (no leading
    # conv), at 'upsampler.2' otherwise — read the end_conv kernel from
    # whichever exists (a silent d_kernel=1 fallback mis-crops output)
    d_conv = 1
    if upsampler_idx == 4:
        for _k in ('upsampler.2.end_conv.weight', 'upsampler.0.end_conv.weight'):
            if _k in sd:
                d_conv = int(sd[_k].shape[2])
                break

    cfg = SMoSRConfig(
        in_ch=in_ch, out_ch=out_dim, dim=dim, scale=scale, rep=bool(rep), n_mb=n_mb,
        upsampler=_V4_MODS[upsampler_idx], mid_dim=mid_dim, group=group, d_kernel=d_conv,
    )
    params = {k: v for k, v in transform_params(sd).items() if k != 'upsampler.MetaUpsample'}
    meta = ModelMetadata(in_channels=in_ch, out_channels=out_dim, upscale=scale, name='SMoSR')
    return SRModel('SMoSR', cfg, params, meta, apply)


ARCH = Architecture(
    id='SMoSR',
    detect_condition=KeyCondition.has_all(
        'short.weight',
        'short.bias',
        'blocks_1.0.short.weight',
        'blocks_1.0.short.bias',
        'blocks_1.0.body.0.eval_conv.weight',
        'blocks_1.0.body.0.eval_conv.bias',
        'blocks_1.0.body.2.eval_conv.weight',
        'blocks_1.0.body.4.eval_conv.weight',
        'blocks_1.1.body.0.eval_conv.weight',
        'blocks_1.1.body.2.eval_conv.weight',
        'blocks_1.1.body.4.eval_conv.weight',
        'blocks_2.0.body.0.eval_conv.weight',
        'blocks_2.0.body.2.eval_conv.weight',
        'blocks_2.0.body.4.eval_conv.weight',
        'end_block.0.body.0.eval_conv.weight',
        'end_block.0.body.2.eval_conv.weight',
        'end_block.0.body.4.eval_conv.weight',
        'end_block.1.eval_conv.weight',
        'end_block.1.eval_conv.bias',
        'upsampler.MetaUpsample',
    ),
    load_fn=_load,
)
