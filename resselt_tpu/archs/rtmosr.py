"""RTMoSR — Real-Time MoSR with fully reparameterized conv bundles.

Parity with resselt/archs/rtmosr/{__init__.py,arch.py}.  RepConv
(SeqConv3x3 + conv3x3 + Conv3XC with alphas) and OmniShift (identity +
dw1/3/5 with per-channel alphas) are collapsed once at load into single
convs (the reference re-fuses on .eval(), arch.py:199-207, 276-282).

Deviation: the reference loader hardcodes metadata upscale ``int(2)``
(rtmosr/__init__.py:104) regardless of the real scale — we report the true
scale so tiled drivers stitch correctly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.reparam import collapse_all, omnishift_collapse, repconv_collapse


@dataclass(frozen=True)
class RTMoSRConfig:
    scale: int
    dim: int
    ffn_expansion: float
    n_blocks: int
    unshuffle_mod: bool
    dccm: bool
    se: bool


def _cse(p: PTree, x):
    """CSELayer (rtmosr/arch.py:7-21)."""
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = F.relu(p.conv('squeezing.0', s))
    s = F.hardsigmoid(p.conv('squeezing.2', s))
    return x * s


def _gated_block(p: PTree, x, cfg: RTMoSRConfig):
    """GatedCNNBlock (rtmosr/arch.py:302-337)."""
    shortcut = x
    x = F.rms_norm_ref(x, p['norm.scale'], p['norm.offset'])
    hidden = int(cfg.ffn_expansion * cfg.dim)
    x = p.conv('fc1.conv_3x3_rep', x, padding=1)
    g = x[..., :hidden]
    i = x[..., hidden : 2 * hidden - cfg.dim]
    c = x[..., 2 * hidden - cfg.dim :]

    # conv path: ParPixelUnshuffle(dim, 4dim, 2) -> OmniShift(4dim) -> [CSE] -> PS(2)
    pu = F.pixel_unshuffle(c, 2)
    poll = F.max_pool2d(c, 2)
    poll = p.conv('conv.0.poll.1.conv_3x3_rep', poll, padding=1)
    c = pu + poll
    dim4 = 4 * cfg.dim
    c = p.conv('conv.1.conv5x5_reparam', c, padding=2, groups=dim4)
    if cfg.se:
        c = _cse(p.sub('conv.2'), c)
    c = F.pixel_shuffle(c, 2)

    x = F.mish(g) * jnp.concatenate([i, c], axis=-1)
    if cfg.dccm:
        x = p.conv('fc2.conv_3x3_rep', x, padding=1)
    else:
        x = p.conv('fc2', x)
    return F.mish(x) + shortcut


def apply(cfg: RTMoSRConfig, params, x):
    p = PTree(params)
    h, w = x.shape[1], x.shape[2]
    unshuffle = 0
    scale = cfg.scale
    if cfg.scale < 4 and cfg.unshuffle_mod:
        unshuffle = 4 // cfg.scale
        scale = 4
    pad = (unshuffle if unshuffle > 0 else 1) * 2
    out = F.pad_to_multiple(x, pad, mode='reflect')
    if unshuffle:
        out = F.pixel_unshuffle(out, unshuffle)
        out = p.conv('to_feat.1.conv_3x3_rep', out, padding=1)
    else:
        out = p.conv('to_feat.conv_3x3_rep', out, padding=1)
    for i in range(cfg.n_blocks):
        out = _gated_block(p.sub(f'body.{i}'), out, cfg)
    out = F.pixel_shuffle(p.conv('to_img.0.conv_3x3_rep', out, padding=1), scale)
    return out[:, : h * cfg.scale, : w * cfg.scale] + F.interpolate_nearest(x, scale_factor=cfg.scale)


_MARKERS = {
    'alpha': (repconv_collapse, 'conv_3x3_rep'),
    'alpha1': (omnishift_collapse, 'conv5x5_reparam'),
}


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/rtmosr/__init__.py:89-104)."""
    unshuffle = False
    if 'to_feat.1.alpha' in sd:
        unshuffle = True
        scale = math.isqrt(sd['to_feat.1.conv_3x3_rep.weight'].shape[1] // 3)
        dim = sd['to_feat.1.conv_3x3_rep.weight'].shape[0]
    else:
        scale = math.isqrt(sd['to_img.0.conv_3x3_rep.weight'].shape[0] // 3)
        dim = sd['to_feat.conv_3x3_rep.weight'].shape[0]
    dccm = 'body.0.fc2.alpha' in sd
    se = 'body.0.conv.2.squeezing.0.weight' in sd
    ffn = sd['body.0.fc1.conv_3x3_rep.weight'].shape[0] / dim / 2
    n_blocks = get_seq_len(sd, 'body')

    if unshuffle:
        # to_feat.1 conv consumes pixel-unshuffled input: 3 * u^2 channels,
        # real scale = 4 / u (reference infers isqrt(channels/3) = u = scale
        # because u == 4//scale for scale in {1, 2})
        scale = 4 // scale if scale in (1, 2, 4) else scale

    cfg = RTMoSRConfig(
        scale=scale, dim=dim, ffn_expansion=ffn, n_blocks=n_blocks,
        unshuffle_mod=unshuffle, dccm=dccm, se=se,
    )
    params = collapse_all(sd, _MARKERS)
    meta = ModelMetadata(in_channels=3, out_channels=3, upscale=scale, name='RTMoSR')
    return SRModel('RTMoSR', cfg, params, meta, apply)


ARCH = Architecture(
    id='RTMoSR',
    detect_condition=KeyCondition.has_all(
        'body.0.norm.scale',
        'body.0.norm.offset',
        'body.0.fc1.alpha',
        'body.0.fc1.conv1.k0',
        'body.0.fc1.conv1.b1',
        'body.0.fc1.conv2.weight',
        'body.0.fc1.conv3.sk.weight',
        'body.0.fc1.conv3.eval_conv.weight',
        'body.0.fc1.conv_3x3_rep.weight',
        'body.0.conv.0.poll.1.alpha',
        'body.0.conv.0.poll.1.conv_3x3_rep.weight',
        'body.0.conv.1.alpha1',
        'body.0.conv.1.alpha4',
        'body.0.conv.1.conv1x1.weight',
        'body.0.conv.1.conv3x3.weight',
        'body.0.conv.1.conv5x5.weight',
        'body.0.conv.1.conv5x5_reparam.weight',
        'to_img.0.alpha',
        'to_img.0.conv_3x3_rep.weight',
    ),
    load_fn=_load,
)
