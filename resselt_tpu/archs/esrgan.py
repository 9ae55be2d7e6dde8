"""ESRGAN / RRDBNet (old-arch layout), incl. BSRGAN/RealSR, Real-ESRGAN and
ESRGAN+ checkpoints.

Parity with resselt/archs/esrgan/{__init__.py,arch.py} and
resselt/utilities/block.py (RRDB :277, ResidualDenseBlock_5C :347,
upconv_block :510).  The new→old key remap tables are copied behaviorally
from resselt/archs/esrgan/__init__.py:14-121.

Improvement over the reference: the remapped dict is actually used for the
weights (the reference loader remaps a copy for config inference but the
registry then strict-loads the unmapped dict, resselt/registry.py:112-113 —
new-arch checkpoints would fail there).
"""

from __future__ import annotations

import functools
import math
import re
from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn.params import PTree


@dataclass(frozen=True)
class ESRGANConfig:
    in_nc: int
    out_nc: int
    num_filters: int
    num_blocks: int
    scale: int  # checkpoint-level scale (before shuffle_factor division)
    plus: bool
    shuffle_factor: int | None


# -- new-arch -> old-arch key remap (reference esrgan/__init__.py:104-121) --

_STATE_MAP_BASE = {
    'model.0.weight': ('conv_first.weight',),
    'model.0.bias': ('conv_first.bias',),
    'model.1.sub./NB/.weight': ('trunk_conv.weight', 'conv_body.weight'),
    'model.1.sub./NB/.bias': ('trunk_conv.bias', 'conv_body.bias'),
    r'model.1.sub.\1.RDB\2.conv\3.0.\4': (
        r'RRDB_trunk\.(\d+)\.RDB(\d)\.conv(\d+)\.(weight|bias)',
        r'body\.(\d+)\.rdb(\d)\.conv(\d+)\.(weight|bias)',
    ),
}


def _get_num_blocks(state, state_map) -> int:
    nbs = []
    state_keys = state_map[r'model.1.sub.\1.RDB\2.conv\3.0.\4'] + (
        r'model\.\d+\.sub\.(\d+)\.RDB(\d+)\.conv(\d+)\.0\.(weight|bias)',
    )
    for state_key in state_keys:
        for k in state:
            m = re.search(state_key, k)
            if m:
                nbs.append(int(m.group(1)))
        if nbs:
            break
    return max(nbs) + 1


def _new_to_old_arch(state, state_map, num_blocks):
    """reference esrgan/__init__.py:14-77."""
    if 'params_ema' in state:
        state = state['params_ema']
    if 'conv_first.weight' not in state:
        return state

    for kind in ('weight', 'bias'):
        state_map[f'model.1.sub.{num_blocks}.{kind}'] = state_map[f'model.1.sub./NB/.{kind}']
        del state_map[f'model.1.sub./NB/.{kind}']

    old_state = {}
    for old_key, new_keys in state_map.items():
        for new_key in new_keys:
            if r'\1' in old_key:
                for k, v in state.items():
                    sub = re.sub(new_key, old_key, k)
                    if sub != k:
                        old_state[sub] = v
            else:
                if new_key in state:
                    old_state[old_key] = state[new_key]

    max_upconv = 0
    for key in state.keys():
        m = re.match(r'(upconv|conv_up)(\d)\.(weight|bias)', key)
        if m is not None:
            _, key_num, key_type = m.groups()
            old_state[f'model.{int(key_num) * 3}.{key_type}'] = state[key]
            max_upconv = max(max_upconv, int(key_num) * 3)

    for key in state.keys():
        if key in ('HRconv.weight', 'conv_hr.weight'):
            old_state[f'model.{max_upconv + 2}.weight'] = state[key]
        elif key in ('HRconv.bias', 'conv_hr.bias'):
            old_state[f'model.{max_upconv + 2}.bias'] = state[key]
        elif key == 'conv_last.weight':
            old_state[f'model.{max_upconv + 4}.weight'] = state[key]
        elif key == 'conv_last.bias':
            old_state[f'model.{max_upconv + 4}.bias'] = state[key]

    def compare(item1: str, item2: str):
        return int(item1.split('.')[1]) - int(item2.split('.')[1])

    return {k: old_state[k] for k in sorted(old_state.keys(), key=functools.cmp_to_key(compare))}


def _to_old_arch(state):
    state_map = {k: v for k, v in _STATE_MAP_BASE.items()}
    if 'params_ema' in state:
        state = state['params_ema']
    num_blocks = _get_num_blocks(state, state_map)
    return _new_to_old_arch(state, state_map, num_blocks)


def _get_scale(state) -> int:
    seq_len = get_seq_len(state, 'model')
    return 2 ** ((seq_len - 5) // 3)


# -- forward ----------------------------------------------------------------


def _rdb(p: PTree, x, plus: bool):
    """ResidualDenseBlock_5C (block.py:347-463). CNA mode: conv -> lrelu(0.2)."""

    def cl(name, v):  # conv + leaky
        return F.leaky_relu(p.conv(f'{name}.0', v, padding='same'), 0.2)

    x1 = cl('conv1', x)
    x2 = cl('conv2', jnp.concatenate([x, x1], axis=-1))
    if plus:
        x2 = x2 + F.conv2d(x, p['conv1x1.weight'])
    x3 = cl('conv3', jnp.concatenate([x, x1, x2], axis=-1))
    x4 = cl('conv4', jnp.concatenate([x, x1, x2, x3], axis=-1))
    if plus:
        x4 = x4 + x2
    x5 = p.conv('conv5.0', jnp.concatenate([x, x1, x2, x3, x4], axis=-1), padding='same')
    return x5 * 0.2 + x


def _rrdb(p: PTree, x, plus: bool):
    out = _rdb(p.sub('RDB1'), x, plus)
    out = _rdb(p.sub('RDB2'), out, plus)
    out = _rdb(p.sub('RDB3'), out, plus)
    return out * 0.2 + x


def apply(cfg: ESRGANConfig, params, x):
    p = PTree(params)
    sf = cfg.shuffle_factor
    run_scale = cfg.scale // sf if sf else cfg.scale
    h, w = x.shape[1], x.shape[2]
    if sf:
        x = F.pad2d(x, (0, (sf - w % sf) % sf, 0, (sf - h % sf) % sf), mode='reflect')
        x = F.pixel_unshuffle(x, sf)

    feat = p.conv('model.0', x, padding=1)
    body = feat
    num_blocks = cfg.num_blocks
    for i in range(num_blocks):
        body = _rrdb(p.sub(f'model.1.sub.{i}'), body, cfg.plus)
    body = p.conv(f'model.1.sub.{num_blocks}', body, padding=1)
    out = feat + body

    n_up = int(math.log2(cfg.scale)) if cfg.scale != 3 else 1
    up_factor = 3 if cfg.scale == 3 else 2
    for i in range(1, n_up + 1):
        out = F.interpolate_nearest(out, scale_factor=up_factor)
        out = F.leaky_relu(p.conv(f'model.{i * 3}', out, padding=1), 0.2)
    max_upconv = 3 * n_up
    out = F.leaky_relu(p.conv(f'model.{max_upconv + 2}', out, padding=1), 0.2)
    out = p.conv(f'model.{max_upconv + 4}', out, padding=1)

    if sf:
        out = out[:, : h * run_scale, : w * run_scale]
    return out


def _load(sd) -> SRModel:
    """Config inference (reference esrgan/__init__.py:155-194)."""
    sd = _to_old_arch(sd)

    model_seq_len = get_seq_len(sd, 'model')
    in_nc = sd['model.0.weight'].shape[1]
    out_nc = sd[f'model.{model_seq_len - 1}.weight'].shape[0]
    scale = _get_scale(sd)
    num_blocks = get_seq_len(sd, 'model.1.sub') - 1
    num_filters = sd['model.0.weight'].shape[0]
    plus = any('.conv1x1.' in k for k in sd.keys())

    if in_nc in (out_nc * 4, out_nc * 16) and out_nc in (in_nc / 4, in_nc / 16):
        shuffle_factor = int(math.sqrt(in_nc / out_nc))
    else:
        shuffle_factor = None

    cfg = ESRGANConfig(
        in_nc=in_nc,
        out_nc=out_nc,
        num_filters=num_filters,
        num_blocks=num_blocks,
        scale=scale,
        plus=plus,
        shuffle_factor=shuffle_factor,
    )
    meta_in_nc, meta_scale = in_nc, scale
    if shuffle_factor:
        meta_in_nc //= shuffle_factor**2
        meta_scale //= shuffle_factor
    meta = ModelMetadata(in_channels=meta_in_nc, out_channels=out_nc, upscale=meta_scale, name='ESRGAN')
    return SRModel('ESRGAN', cfg, dict(sd), meta, apply)


ARCH = Architecture(
    id='ESRGAN',
    detect_condition=KeyCondition.has_any(
        KeyCondition.has_all('model.0.weight', 'model.1.sub.0.RDB1.conv1.0.weight'),
        KeyCondition.has_all('conv_first.weight', 'body.0.rdb1.conv1.weight', 'conv_body.weight', 'conv_last.weight'),
        KeyCondition.has_all('conv_first.weight', 'RRDB_trunk.0.RDB1.conv1.weight', 'trunk_conv.weight', 'conv_last.weight'),
        KeyCondition.has_all('model.0.weight', 'model.1.sub.0.RDB1.conv1x1.weight'),
    ),
    load_fn=_load,
)
