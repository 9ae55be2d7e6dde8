"""GateRV3 — hybrid gated U-Net + SPAN SISR branch.

Parity with resselt/archs/gaterv3/{__init__.py,arch.py}: GateRv2-style
MetaGated U-Net, restormer-style channel attention latent (optional),
parallel SPAN branch (bias-free Conv3XC SPABs collapsed at load) feeding
the UniUpsampleV3 tail, gamma-scaled nearest-upsampled input residual.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.reparam import collapse_all, conv3xc_collapse
from ..nn.upsample import SAMPLE_MODS3, uni_upsample_v3
from .gaterv2 import _meta_gated
from .mosrv2 import _inception_dwconv


@dataclass(frozen=True)
class GateRV3Config:
    in_ch: int
    dim: int
    enc_blocks: tuple[int, ...]
    dec_blocks: tuple[int, ...]
    num_latent: int
    scale: int
    upsampler: str
    upsample_mid_dim: int
    attention: bool
    span_blocks: int
    end_kernel: int


def _channel_attention(p: PTree, x, heads: int = 16):
    """Latent Attention (gaterv3/arch.py:549-585): XCiT over head_dim tokens."""
    b, h, w, c = x.shape
    n = h * w
    hd = c // heads
    qkv = F.conv2d(x, p['qkv.weight'])
    qkv = p.conv('qkv_dwconv', qkv, padding=1, groups=3 * c)
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]

    # torch: view(b, heads, hd, hw) from NCHW; NHWC equivalent
    def split(t):
        return t.reshape(b, n, heads, hd).transpose(0, 2, 3, 1)  # (b, heads, hd, n)

    q, k, v = split(q), split(k), split(v)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    temp = p['temperature'].astype(x.dtype).reshape(1, heads, 1, 1)
    attn = jnp.einsum('bhdn,bhen->bhde', q, k, preferred_element_type=jnp.float32).astype(x.dtype) * temp
    attn = F.softmax(attn)
    out = jnp.einsum('bhde,bhen->bhdn', attn, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
    return F.conv2d(out, p['project_out.weight'])


def _gated_cnn(p: PTree, x, dim: int, att: bool):
    """GatedCNNBlock (gaterv3/arch.py:587-626): no inner residual."""
    x = F.rms_norm_ref(x, p['norm.scale'], p['norm.offset'])
    x = p.conv('fc1', x)
    hidden = int(1.5 * dim)
    g = x[..., :hidden]
    i = x[..., hidden : 2 * hidden - dim]
    c = x[..., 2 * hidden - dim :]
    if att:
        c = _channel_attention(p.sub('token_mix'), c)
    else:
        c = _inception_dwconv(p.sub('token_mix'), c)
    x = F.mish(g) * jnp.concatenate([i, c], axis=-1)
    return F.mish(p.conv('fc2', x))


def _spab(p: PTree, x):
    """Bias-free SPAB (gaterv3/arch.py:477-499), inplace-SiLU quirk."""
    out1_act = F.silu(p.conv('c1_r.eval_conv', x, padding=1))
    out2 = p.conv('c2_r.eval_conv', out1_act, padding=1)
    out3 = p.conv('c3_r.eval_conv', F.silu(out2), padding=1)
    sim_att = F.sigmoid(out3) - 0.5
    return (out3 + x) * sim_att, out1_act


def apply(cfg: GateRV3Config, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    pad = 2 ** len(cfg.enc_blocks)
    inp = F.pad_to_multiple(x, pad, mode='reflect')
    x = p.conv('in_to_dim', inp, padding=1)

    # SPAN branch (arch.py:784-790)
    sisr, _ = _spab(p.sub('span_block0'), x)
    sisr_short = sisr
    for i in range(cfg.span_blocks):
        sisr, _ = _spab(p.sub(f'span_n_b.{i}'), sisr)
    sisr, sisr_out = _spab(p.sub('span_end'), sisr)
    sisr = p.conv('sisr_end_conv.eval_conv', sisr, padding=1)
    sisr = p.conv('sisr_cat_conv', jnp.concatenate([x, sisr, sisr_short, sisr_out], axis=-1))

    shorts = []
    y = x
    for i, nb in enumerate(cfg.enc_blocks):
        bp = p.sub(f'gater_encode.{i}')
        dim_i = cfg.dim * (2**i)
        for j in range(nb):
            y = _meta_gated(bp.sub(f'gated.{j}'), y, dim_i)
        shorts.append(y)
        y = F.pixel_unshuffle(F.conv2d(y, bp['scale.0.weight'], padding=1), 2)

    latent_dim = cfg.dim * (2 ** len(cfg.enc_blocks))
    for i in range(cfg.num_latent):
        y = _gated_cnn(p.sub(f'latent.{i}'), y, latent_dim, cfg.attention)

    shorts.reverse()
    for i, nb in enumerate(cfg.dec_blocks):
        bp = p.sub(f'decode.{i}')
        dim_i = cfg.dim * (2 ** (len(cfg.dec_blocks) - i))
        y = F.pixel_shuffle(F.conv2d(y, bp['scale.0.weight'], padding=1), 2)
        y = bp.conv('shor', jnp.concatenate([y, shorts[i]], axis=-1))
        for j in range(nb):
            y = _meta_gated(bp.sub(f'gated.{j}'), y, dim_i // 2)

    gamma = p['gamma'].reshape(-1).astype(x.dtype)
    if cfg.scale != 1:
        out = uni_upsample_v3(
            p.sub('dim_to_in'), y + sisr, cfg.upsampler, cfg.scale, cfg.in_ch,
            cfg.upsample_mid_dim, dysample_end_kernel=cfg.end_kernel,
        )
        out = out + gamma * F.interpolate_nearest(inp, scale_factor=cfg.scale)
    else:
        out = p.conv('dim_to_in', y + sisr, padding=1) + gamma * inp
    return out[:, : h0 * cfg.scale, : w0 * cfg.scale]


# keyed on the Conv3XC-unique '.sk.weight' (same prefix as 'conv.0.weight'
# but never false-matches the pa_up upsampler's PA gate 'conv.0.weight',
# which is a plain sequential conv, not a Conv3XC bundle)
_MARKERS = {'sk.weight': (conv3xc_collapse, 'eval_conv')}


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/gaterv3/__init__.py:123-157)."""
    dim, in_ch = sd['in_to_dim.weight'].shape[:2]
    enc_blocks = tuple(get_seq_len(sd, f'gater_encode.{i}.gated') for i in range(get_seq_len(sd, 'gater_encode')))
    latent = get_seq_len(sd, 'latent')
    dec_blocks = tuple(get_seq_len(sd, f'decode.{i}.gated') for i in range(get_seq_len(sd, 'decode')))
    end_kernel = 1
    if 'dim_to_in.MetaUpsample' in sd:
        meta_buf = [int(v) for v in sd['dim_to_in.MetaUpsample'].reshape(-1)]
        _, index, scale, _, out_ch, upsample_dim, _ = meta_buf
        upsampler = SAMPLE_MODS3[index]
        if upsampler == 'dysample' and 'dim_to_in.0.weight' not in sd:
            upsample_dim = dim
            end_kernel = sd['dim_to_in.0.end_conv.weight'].shape[2]
        elif upsampler == 'dysample':
            end_kernel = sd['dim_to_in.2.end_conv.weight'].shape[2]
    else:
        scale, upsample_dim, upsampler = 1, 32, 'conv'
    attention = 'latent.0.token_mix.qkv_dwconv.weight' in sd
    span_blocks = get_seq_len(sd, 'span_n_b')

    cfg = GateRV3Config(
        in_ch=in_ch, dim=dim, enc_blocks=enc_blocks, dec_blocks=dec_blocks,
        num_latent=latent, scale=scale, upsampler=upsampler,
        upsample_mid_dim=upsample_dim, attention=attention,
        span_blocks=span_blocks, end_kernel=end_kernel,
    )
    params = collapse_all(sd, _MARKERS)
    params = {k: v for k, v in params.items() if k != 'dim_to_in.MetaUpsample'}
    import numpy as np

    if 'gamma' not in params:
        params['gamma'] = np.ones((1, in_ch, 1, 1), np.float32)
    meta = ModelMetadata(in_channels=in_ch, out_channels=in_ch, upscale=scale, name='GateRV3')
    return SRModel('GateRV3', cfg, params, meta, apply)


ARCH = Architecture(
    id='GateRV3',
    detect_condition=KeyCondition.has_all(
        'in_to_dim.weight',
        'in_to_dim.bias',
        'gater_encode.0.gated.0.gamma0',
        'gater_encode.0.gated.0.gamma1',
        'gater_encode.0.gated.0.local.0.scale',
        'gater_encode.0.gated.0.local.0.offset',
        'gater_encode.0.gated.0.local.1.weight',
        'gater_encode.0.gated.0.local.1.bias',
        'gater_encode.0.gated.0.local.2.weight',
        'gater_encode.0.gated.0.local.2.bias',
        'gater_encode.0.gated.0.sca.1.weight',
        'gater_encode.0.gated.0.sca.1.bias',
        'gater_encode.0.gated.0.glob.norm.scale',
        'gater_encode.0.gated.0.glob.norm.offset',
        'gater_encode.0.gated.0.glob.fc1.weight',
        'gater_encode.0.gated.0.glob.fc1.bias',
        'gater_encode.0.gated.0.glob.token_mix.dwconv_hw.weight',
        'gater_encode.0.gated.0.glob.token_mix.dwconv_hw.bias',
        'gater_encode.0.gated.0.glob.token_mix.dwconv_w.weight',
        'gater_encode.0.gated.0.glob.token_mix.dwconv_w.bias',
        'gater_encode.0.gated.0.glob.token_mix.dwconv_h.weight',
        'gater_encode.0.gated.0.glob.token_mix.dwconv_h.bias',
        'gater_encode.0.gated.0.glob.fc2.weight',
        'gater_encode.0.gated.0.glob.fc2.bias',
        'gater_encode.0.scale.0.weight',
        'span_block0.c1_r.sk.weight',
        'span_block0.c1_r.conv.0.weight',
        'span_block0.c1_r.conv.1.weight',
        'span_block0.c1_r.conv.2.weight',
        'span_block0.c1_r.eval_conv.weight',
        'span_block0.c2_r.sk.weight',
        'span_block0.c2_r.conv.0.weight',
        'span_block0.c2_r.conv.1.weight',
        'span_block0.c2_r.conv.2.weight',
        'span_block0.c2_r.eval_conv.weight',
        'span_block0.c3_r.sk.weight',
        'span_block0.c3_r.conv.0.weight',
        'span_block0.c3_r.conv.1.weight',
        'span_block0.c3_r.conv.2.weight',
        'span_block0.c3_r.eval_conv.weight',
        'span_n_b.0.c1_r.sk.weight',
        'span_n_b.0.c1_r.conv.0.weight',
        'span_n_b.0.c1_r.conv.1.weight',
        'span_n_b.0.c1_r.conv.2.weight',
        'span_n_b.0.c1_r.eval_conv.weight',
        'span_n_b.0.c2_r.sk.weight',
        'span_n_b.0.c2_r.conv.0.weight',
        'span_n_b.0.c2_r.conv.1.weight',
        'span_n_b.0.c2_r.conv.2.weight',
        'span_n_b.0.c2_r.eval_conv.weight',
        'span_n_b.0.c3_r.sk.weight',
        'span_n_b.0.c3_r.conv.0.weight',
        'span_n_b.0.c3_r.conv.1.weight',
        'span_n_b.0.c3_r.conv.2.weight',
        'span_n_b.0.c3_r.eval_conv.weight',
        'span_end.c1_r.sk.weight',
        'span_end.c1_r.conv.0.weight',
        'span_end.c1_r.conv.1.weight',
        'span_end.c1_r.conv.2.weight',
        'span_end.c1_r.eval_conv.weight',
        'span_end.c2_r.sk.weight',
        'span_end.c2_r.conv.0.weight',
        'span_end.c2_r.conv.1.weight',
        'span_end.c2_r.conv.2.weight',
        'span_end.c2_r.eval_conv.weight',
        'span_end.c3_r.sk.weight',
        'span_end.c3_r.conv.0.weight',
        'span_end.c3_r.conv.1.weight',
        'span_end.c3_r.conv.2.weight',
        'span_end.c3_r.eval_conv.weight',
        'sisr_end_conv.sk.weight',
        'sisr_end_conv.sk.bias',
        'sisr_end_conv.conv.0.weight',
        'sisr_end_conv.conv.0.bias',
        'sisr_end_conv.conv.1.weight',
        'sisr_end_conv.conv.1.bias',
        'sisr_end_conv.conv.2.weight',
        'sisr_end_conv.conv.2.bias',
        'sisr_end_conv.eval_conv.weight',
        'sisr_end_conv.eval_conv.bias',
        'sisr_cat_conv.weight',
        'sisr_cat_conv.bias',
        'decode.0.scale.0.weight',
        'decode.0.gated.0.gamma0',
        'decode.0.gated.0.gamma1',
        'decode.0.gated.0.local.0.scale',
        'decode.0.gated.0.local.0.offset',
        'decode.0.gated.0.local.1.weight',
        'decode.0.gated.0.local.1.bias',
        'decode.0.gated.0.local.2.weight',
        'decode.0.gated.0.local.2.bias',
        'decode.0.gated.0.sca.1.weight',
        'decode.0.gated.0.sca.1.bias',
        'decode.0.gated.0.glob.norm.scale',
        'decode.0.gated.0.glob.norm.offset',
        'decode.0.gated.0.glob.fc1.weight',
        'decode.0.gated.0.glob.fc1.bias',
        'decode.0.gated.0.glob.token_mix.dwconv_hw.weight',
        'decode.0.gated.0.glob.token_mix.dwconv_hw.bias',
        'decode.0.gated.0.glob.token_mix.dwconv_w.weight',
        'decode.0.gated.0.glob.token_mix.dwconv_w.bias',
        'decode.0.gated.0.glob.token_mix.dwconv_h.weight',
        'decode.0.gated.0.glob.token_mix.dwconv_h.bias',
        'decode.0.gated.0.glob.fc2.weight',
        'decode.0.gated.0.glob.fc2.bias',
        'decode.0.shor.weight',
        'decode.0.shor.bias',
    ),
    load_fn=_load,
)
