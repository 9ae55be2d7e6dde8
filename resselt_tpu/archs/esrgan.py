"""ESRGAN / RRDBNet (old-arch layout), incl. BSRGAN/RealSR, Real-ESRGAN and
ESRGAN+ checkpoints.

Parity with resselt/archs/esrgan/{__init__.py,arch.py} and
resselt/utilities/block.py (RRDB :277, ResidualDenseBlock_5C :347,
upconv_block :510).  The new→old key remap implements the behavioral
contract of resselt/archs/esrgan/__init__.py:14-121 as data tables.

Improvement over the reference: the remapped dict is actually used for the
weights (the reference loader remaps a copy for config inference but the
registry then strict-loads the unmapped dict, resselt/registry.py:112-113 —
new-arch checkpoints would fail there).
"""

from __future__ import annotations

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


# -- new-arch -> old-arch key remap ------------------------------------------
#
# New-arch checkpoints come in two key spellings (BSRGAN/RealSR
# 'RRDB_trunk.N.RDBk.convM.*' and Real-ESRGAN 'body.N.rdbk.convM.*'); the
# forward pass uses the flattened old-arch 'model.N' naming.  The mapping is
# the behavioral contract of resselt/archs/esrgan/__init__.py:14-121,
# expressed here as data tables.

# body blocks, in detection-priority order; group 1 of each regex is the
# block index.  The third spelling is the old layout itself (counting only).
_BODY_PATTERNS = (
    re.compile(r'RRDB_trunk\.(\d+)\.RDB(\d)\.conv(\d+)\.(weight|bias)'),
    re.compile(r'body\.(\d+)\.rdb(\d)\.conv(\d+)\.(weight|bias)'),
    re.compile(r'model\.\d+\.sub\.(\d+)\.RDB(\d+)\.conv(\d+)\.0\.(weight|bias)'),
)
_BODY_TEMPLATE = r'model.1.sub.\1.RDB\2.conv\3.0.\4'

# head / trunk convs: new name -> old index template ({nb} = num body blocks)
_HEAD_RENAMES = {
    'conv_first': 'model.0',
    'trunk_conv': 'model.1.sub.{nb}',
    'conv_body': 'model.1.sub.{nb}',
}

# upsampling tail: upconvN/conv_upN -> model.{3N}; HR conv and last conv sit
# 2 and 4 slots past the highest upconv (0 when there is none)
_UPCONV_PATTERN = re.compile(r'(?:upconv|conv_up)(\d)\.(weight|bias)')
_TAIL_OFFSETS = {'HRconv': 2, 'conv_hr': 2, 'conv_last': 4}


def _num_body_blocks(state) -> int:
    for pattern in _BODY_PATTERNS:
        idxs = [int(m.group(1)) for k in state if (m := pattern.search(k))]
        if idxs:
            return max(idxs) + 1
    raise ValueError('ESRGAN: no RRDB body keys found')


def _to_old_arch(state):
    if 'params_ema' in state:
        state = state['params_ema']
    if 'conv_first.weight' not in state:
        return state  # already old-arch
    nb = _num_body_blocks(state)

    out = {}
    for pattern in _BODY_PATTERNS[:2]:
        for k, v in state.items():
            new_key, n = pattern.subn(_BODY_TEMPLATE, k)
            if n:
                out[new_key] = v
    for src, dst in _HEAD_RENAMES.items():
        for kind in ('weight', 'bias'):
            if f'{src}.{kind}' in state:
                out[f'{dst.format(nb=nb)}.{kind}'] = state[f'{src}.{kind}']

    max_upconv = 0
    for k, v in state.items():
        m = _UPCONV_PATTERN.match(k)
        if m:
            idx = 3 * int(m.group(1))
            out[f'model.{idx}.{m.group(2)}'] = v
            max_upconv = max(max_upconv, idx)
    for src, offset in _TAIL_OFFSETS.items():
        for kind in ('weight', 'bias'):
            if f'{src}.{kind}' in state:
                out[f'model.{max_upconv + offset}.{kind}'] = state[f'{src}.{kind}']

    return dict(sorted(out.items(), key=lambda kv: int(kv[0].split('.')[1])))


def _get_scale(state) -> int:
    seq_len = get_seq_len(state, 'model')
    return 2 ** ((seq_len - 5) // 3)


# -- forward ----------------------------------------------------------------


def _rdb(p: PTree, x, plus: bool):
    """ResidualDenseBlock_5C (block.py:347-463), producer-decomposed.

    Identical math to the reference's five convs c_i = conv(concat(x,
    f_1..f_{i-1})) with each conv's channel sum distributed over input
    slices and regrouped by PRODUCER: stage j emits one wide conv from
    f_j (stage 0: from x) to all its later consumers, so conv output
    widths are 4gc+nf/3gc+nf/2gc+nf/gc+nf/nf instead of gc — cutting the
    MXU's cout->128 lane padding 2.2x (the contraction dim never lane-
    pads).  Measured 1.73x on the RDB chain in bf16, f32-neutral
    (tools/probe_rdb_producer.py); the only fp difference is summation
    order.  Weights are resliced from the canonical torch-layout params
    at trace time (a few hundred KB of concats, negligible).
    """
    nf = x.shape[-1]
    pairs = [p.conv_weight_int8(f'conv{i}.0') for i in range(1, 6)]
    gc = pairs[0][0].shape[0]
    # int8 serving (resselt_tpu.quant): the producer regroup concatenates
    # the five weights, so the int8 path needs ALL of them quantized —
    # per-OUT-channel scales then slice/concat along the same axis as the
    # regroup.  A partially-quantized RDB (possible when gc and nf straddle
    # the eligibility bound) dequantizes the int8 members at trace time
    # (exact math) instead of mixing dtypes in the concat.
    int8 = all(s is not None for _, s in pairs)
    if int8:
        ws = [w for w, _ in pairs]
        scales = [s for _, s in pairs]
    else:
        ws = [w if s is None else
              (w.astype(jnp.float32) * s[:, None, None, None]).astype(x.dtype)
              for w, s in pairs]

    def producer_w(j):  # stage j: j==0 consumes x, j>=1 consumes f_j
        lo = 0 if j == 0 else nf + (j - 1) * gc
        hi = nf if j == 0 else lo + gc
        w = jnp.concatenate([ws[i][:, lo:hi] for i in range(j, 5)], axis=0)
        if int8:
            return w, jnp.concatenate([scales[i] for i in range(j, 5)])
        return w, None

    def pconv(xin, j, bias=None):
        w, s = producer_w(j)
        if int8:
            return F.conv2d_int8(xin, w, s, bias, padding='same')
        return F.conv2d(xin, w, bias, padding='same')

    # all five biases land once, in the stage-0 output
    bias0 = [p.get(f'conv{i}.0.bias') for i in range(1, 6)]
    if any(b is not None for b in bias0):
        bias0 = jnp.concatenate(
            [b if b is not None else jnp.zeros(w.shape[0], x.dtype)
             for b, w in zip(bias0, ws)])
    else:
        bias0 = None

    a = pconv(x, 0, bias0)
    f2 = None
    for j in range(1, 5):
        f = F.leaky_relu(a[..., :gc], 0.2)
        if plus and j == 2:
            w11, s11 = p.conv_weight_int8('conv1x1')
            if s11 is not None:
                f = f + F.conv2d_int8(x, w11, s11)
            else:
                f = f + F.conv2d(x, w11)
            f2 = f
        if plus and j == 4:
            f = f + f2
        a = a[..., gc:] + pconv(f, j)
    return a * 0.2 + x


def _rrdb(p: PTree, x, plus: bool):
    out = _rdb(p.sub('RDB1'), x, plus)
    out = _rdb(p.sub('RDB2'), out, plus)
    out = _rdb(p.sub('RDB3'), out, plus)
    return out * 0.2 + x


def _head(cfg: ESRGANConfig, p: PTree, x):
    """Input shuffle + first conv; returns (feat, (h, w)) for the tail crop."""
    sf = cfg.shuffle_factor
    h, w = x.shape[1], x.shape[2]
    if sf:
        x = F.pad2d(x, (0, (sf - w % sf) % sf, 0, (sf - h % sf) % sf), mode='reflect')
        x = F.pixel_unshuffle(x, sf)
    return p.conv('model.0', x, padding=1), (h, w)


def _tail(cfg: ESRGANConfig, p: PTree, feat, body, hw):
    body = p.conv(f'model.1.sub.{cfg.num_blocks}', body, padding=1)
    out = feat + body

    n_up = int(math.log2(cfg.scale)) if cfg.scale != 3 else 1
    up_factor = 3 if cfg.scale == 3 else 2
    for i in range(1, n_up + 1):
        out = F.interpolate_nearest(out, scale_factor=up_factor)
        out = F.leaky_relu(p.conv(f'model.{i * 3}', out, padding=1), 0.2)
    max_upconv = 3 * n_up
    out = F.leaky_relu(p.conv(f'model.{max_upconv + 2}', out, padding=1), 0.2)
    out = p.conv(f'model.{max_upconv + 4}', out, padding=1)

    if cfg.shuffle_factor:
        run_scale = cfg.scale // cfg.shuffle_factor
        out = out[:, : hw[0] * run_scale, : hw[1] * run_scale]
    return out


def apply(cfg: ESRGANConfig, params, x):
    p = PTree(params)
    feat, hw = _head(cfg, p, x)
    body = feat
    for i in range(cfg.num_blocks):
        body = _rrdb(p.sub(f'model.1.sub.{i}'), body, cfg.plus)
    return _tail(cfg, p, feat, body, hw)


def apply_pipelined(cfg: ESRGANConfig, params, x, mesh, axis: str = 'pp',
                    num_microbatches: int | None = None):
    """``apply`` with the RRDB trunk executed by the GPipe pipeline executor
    (``parallel/pipeline.py``) over mesh axis ``axis``; head/tail convs run
    replicated.  Output-equivalent to ``apply`` (trunk structure:
    resselt/utilities/block.py:277-345).  The 23 RRDBs are chunked into
    ``mesh.shape[axis]`` equal stages, padding the last stage with masked-out
    blocks when the count does not divide evenly."""
    from ..parallel.pipeline import chunk_blocks, masked_stage_fn, pipeline_apply

    p = PTree(params)
    feat, hw = _head(cfg, p, x)

    per_block = []
    for i in range(cfg.num_blocks):
        pref = f'model.1.sub.{i}.'
        per_block.append({k[len(pref):]: v for k, v in params.items() if k.startswith(pref)})
    stacked = chunk_blocks(per_block, mesh.shape[axis])
    stage = masked_stage_fn(lambda bp, h: _rrdb(PTree(bp), h, cfg.plus))
    body = pipeline_apply(stage, stacked, feat, mesh, axis=axis,
                          num_microbatches=num_microbatches)
    return _tail(cfg, p, feat, body, hw)


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
    model = SRModel('ESRGAN', cfg, dict(sd), meta, apply)
    # halo 4 at seam parity (53.1 dB vs 53.4 at h16, sweep_halo.json):
    # 11.4 vs 9.6 f32 / 18.9 vs 16.3 bf16 MP/s tiled 720p t256
    model.serving_halo = 4
    return model


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
