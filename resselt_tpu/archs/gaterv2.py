"""GateRv2 — NAFNet-style gated U-Net with linear-attention latent.

Parity with resselt/archs/gaterv2/{__init__.py,arch.py}: MetaGated blocks
(local simple-gate + global gated CNN with InceptionDWConv2d), Taylor
linear attention latent, UniUpsample tail for SR variants.

Deviations (reference bugs): the reference loader probes
'upsample.MetaUpsample' but reads 'to_img.MetaUpsample' (gaterv2/__init__.py:131-133,
crashes on SR checkpoints) — we read the probed key; and the forward crops
with a hardcoded scale of 1 (arch.py:399,467) — we crop with the real scale.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.upsample import SAMPLE_MODS, uni_upsample
from .mosrv2 import _inception_dwconv


@dataclass(frozen=True)
class GateRV2Config:
    in_ch: int
    dim: int
    enc_blocks: tuple[int, ...]
    dec_blocks: tuple[int, ...]
    num_latent: int
    scale: int
    upsampler: str
    upsample_mid_dim: int


def _taylor_attention(p: PTree, x):
    """Latent linear attention (gaterv2/arch.py:219-261); x: NHWC."""
    b, h, w, c = x.shape
    n = h * w
    q = p.conv('query_conv', x).reshape(b, n, -1)  # (B, N, c/s)
    k = p.conv('key_conv', x).reshape(b, n, -1)
    v = p.conv('value_conv', x).reshape(b, n, c)

    # l2_norm normalizes over the channel dim (dim=-2 of (B, C, N))
    qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    kn = k / jnp.linalg.norm(k, axis=-1, keepdims=True).clip(1e-12)
    # NOTE: in torch layout Q/K are (B, c/s, N) and l2_norm normalizes each
    # column over channels; in our (B, N, c/s) layout that is the last axis.
    eps = 1e-6
    k_sum = kn.sum(axis=1)  # (B, c/s)
    tailor = 1.0 / (n + jnp.einsum('bnc,bc->bn', qn, k_sum + eps))
    value_sum = v.sum(axis=1)  # (B, C)
    matrix = jnp.einsum('bnm,bnc->bmc', kn, v, preferred_element_type=jnp.float32).astype(x.dtype)  # (B, c/s, C)
    matrix_sum = value_sum[:, None, :] + jnp.einsum('bnm,bmc->bnc', qn, matrix, preferred_element_type=jnp.float32).astype(x.dtype)
    out = matrix_sum * tailor[:, :, None]
    return out.reshape(b, h, w, c)


def _gated_cnn(p: PTree, x, dim: int, att: bool, expansion_ratio: float = 1.5):
    """GatedCNNBlock (gaterv2/arch.py:263-299): no inner residual."""
    x = F.rms_norm_ref(x, p['norm.scale'], p['norm.offset'])
    x = p.conv('fc1', x)
    hidden = int(expansion_ratio * dim)
    g = x[..., :hidden]
    i = x[..., hidden : 2 * hidden - dim]
    c = x[..., 2 * hidden - dim :]
    if att:
        c = _taylor_attention(p.sub('token_mix'), c)
    else:
        c = _inception_dwconv(p.sub('token_mix'), c)
    x = F.mish(g) * jnp.concatenate([i, c], axis=-1)
    return F.mish(p.conv('fc2', x))


def _meta_gated(p: PTree, x, dim: int):
    """MetaGated (gaterv2/arch.py:301-340)."""
    short = x
    y = F.rms_norm_ref(x, p['local.0.scale'], p['local.0.offset'])
    y = p.conv('local.1', y)
    y = p.conv('local.2', y, padding=1, groups=dim)
    half = y.shape[-1] // 2
    y = y[..., :half] * y[..., half:]
    sca = p.conv('sca.1', jnp.mean(y, axis=(1, 2), keepdims=True))
    y = y * sca
    x = y * p['gamma0'].reshape(-1).astype(x.dtype) + short
    x = _gated_cnn(p.sub('glob'), x, dim, att=False) * p['gamma1'].reshape(-1).astype(x.dtype) + x
    return x


def apply(cfg: GateRV2Config, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    pad = 2 ** len(cfg.enc_blocks)
    inp = F.pad_to_multiple(x, pad, mode='reflect')
    x = p.conv('in_to_dim', inp, padding=1)

    shorts = []
    for i, nb in enumerate(cfg.enc_blocks):
        bp = p.sub(f'encode.{i}')
        dim_i = cfg.dim * (2**i)
        for j in range(nb):
            x = _meta_gated(bp.sub(f'gated.{j}'), x, dim_i)
        shorts.append(x)
        x = F.pixel_unshuffle(F.conv2d(x, bp['scale.0.weight'], padding=1), 2)

    latent_dim = cfg.dim * (2 ** len(cfg.enc_blocks))
    for i in range(cfg.num_latent):
        x = _gated_cnn(p.sub(f'latent.{i}'), x, latent_dim, att=True)

    shorts.reverse()
    for i, nb in enumerate(cfg.dec_blocks):
        bp = p.sub(f'decode.{i}')
        dim_i = cfg.dim * (2 ** (len(cfg.dec_blocks) - i))
        x = F.pixel_shuffle(F.conv2d(x, bp['scale.0.weight'], padding=1), 2)
        x = bp.conv('shor', jnp.concatenate([x, shorts[i]], axis=-1))
        for j in range(nb):
            x = _meta_gated(bp.sub(f'gated.{j}'), x, dim_i // 2)

    if cfg.scale != 1:
        out1 = F.mish(p.conv('short_to_dim.block.0', inp, padding=1))
        out1 = F.mish(p.conv('short_to_dim.block.2', out1, padding=1))
        short = out1 + p.conv('short_to_dim.conv11', inp)
        x = x + short
        x = uni_upsample(p.sub('upsample'), x, cfg.upsampler, cfg.scale, cfg.in_ch, cfg.upsample_mid_dim)
    else:
        x = p.conv('dim_to_in', x, padding=1) + inp
    return x[:, : h0 * cfg.scale, : w0 * cfg.scale]


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/gaterv2/__init__.py:125-137)."""
    dim, in_ch = sd['in_to_dim.weight'].shape[:2]
    enc_blocks = tuple(get_seq_len(sd, f'encode.{i}.gated') for i in range(get_seq_len(sd, 'encode')))
    latent = get_seq_len(sd, 'latent')
    dec_blocks = tuple(get_seq_len(sd, f'decode.{i}.gated') for i in range(get_seq_len(sd, 'decode')))
    if 'upsample.MetaUpsample' in sd:
        meta_buf = [int(v) for v in sd['upsample.MetaUpsample'].reshape(-1)]
        _, index, scale, _, out_ch, upsample_dim, _ = meta_buf
        upsampler = SAMPLE_MODS[index]
    else:
        scale, upsample_dim, upsampler = 1, 32, 'conv'

    cfg = GateRV2Config(
        in_ch=in_ch, dim=dim, enc_blocks=enc_blocks, dec_blocks=dec_blocks,
        num_latent=latent, scale=scale, upsampler=upsampler, upsample_mid_dim=upsample_dim,
    )
    params = {k: v for k, v in sd.items() if k != 'upsample.MetaUpsample'}
    meta = ModelMetadata(in_channels=in_ch, out_channels=in_ch, upscale=scale, name='GateRv2')
    return SRModel('GateRv2', cfg, params, meta, apply)


ARCH = Architecture(
    id='GateRv2',
    detect_condition=KeyCondition.has_all(
        'in_to_dim.weight',
        'in_to_dim.bias',
        'encode.0.gated.0.gamma0',
        'encode.0.gated.0.gamma1',
        'encode.0.gated.0.local.0.scale',
        'encode.0.gated.0.local.0.offset',
        'encode.0.gated.0.local.1.weight',
        'encode.0.gated.0.local.1.bias',
        'encode.0.gated.0.local.2.weight',
        'encode.0.gated.0.local.2.bias',
        'encode.0.gated.0.sca.1.weight',
        'encode.0.gated.0.sca.1.bias',
        'encode.0.gated.0.glob.norm.scale',
        'encode.0.gated.0.glob.norm.offset',
        'encode.0.gated.0.glob.fc1.weight',
        'encode.0.gated.0.glob.fc1.bias',
        'encode.0.gated.0.glob.token_mix.dwconv_hw.weight',
        'encode.0.gated.0.glob.token_mix.dwconv_hw.bias',
        'encode.0.gated.0.glob.token_mix.dwconv_w.weight',
        'encode.0.gated.0.glob.token_mix.dwconv_w.bias',
        'encode.0.gated.0.glob.token_mix.dwconv_h.weight',
        'encode.0.gated.0.glob.token_mix.dwconv_h.bias',
        'encode.0.gated.0.glob.fc2.weight',
        'encode.0.gated.0.glob.fc2.bias',
        'encode.0.scale.0.weight',
        'encode.1.gated.0.gamma0',
        'encode.1.gated.0.gamma1',
        'encode.1.gated.0.local.0.scale',
        'encode.1.gated.0.local.0.offset',
        'encode.1.gated.0.local.1.weight',
        'encode.1.gated.0.local.1.bias',
        'encode.1.gated.0.local.2.weight',
        'encode.1.gated.0.local.2.bias',
        'encode.1.gated.0.sca.1.weight',
        'encode.1.gated.0.sca.1.bias',
        'encode.1.gated.0.glob.norm.scale',
        'encode.1.gated.0.glob.norm.offset',
        'encode.1.gated.0.glob.fc1.weight',
        'encode.1.gated.0.glob.fc1.bias',
        'encode.1.gated.0.glob.token_mix.dwconv_hw.weight',
        'encode.1.gated.0.glob.token_mix.dwconv_hw.bias',
        'encode.1.gated.0.glob.token_mix.dwconv_w.weight',
        'encode.1.gated.0.glob.token_mix.dwconv_w.bias',
        'encode.1.gated.0.glob.token_mix.dwconv_h.weight',
        'encode.1.gated.0.glob.token_mix.dwconv_h.bias',
        'encode.1.gated.0.glob.fc2.weight',
        'encode.1.gated.0.glob.fc2.bias',
        'encode.1.scale.0.weight',
        'latent.0.norm.scale',
        'latent.0.norm.offset',
        'latent.0.fc1.weight',
        'latent.0.fc1.bias',
        'latent.0.token_mix.query_conv.weight',
        'latent.0.token_mix.query_conv.bias',
        'latent.0.token_mix.key_conv.weight',
        'latent.0.token_mix.key_conv.bias',
        'latent.0.token_mix.value_conv.weight',
        'latent.0.token_mix.value_conv.bias',
        'latent.0.fc2.weight',
        'latent.0.fc2.bias',
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
        'decode.1.scale.0.weight',
        'decode.1.gated.0.gamma0',
        'decode.1.gated.0.gamma1',
        'decode.1.gated.0.local.0.scale',
        'decode.1.gated.0.local.0.offset',
        'decode.1.gated.0.local.1.weight',
        'decode.1.gated.0.local.1.bias',
        'decode.1.gated.0.local.2.weight',
        'decode.1.gated.0.local.2.bias',
        'decode.1.gated.0.sca.1.weight',
        'decode.1.gated.0.sca.1.bias',
        'decode.1.gated.0.glob.norm.scale',
        'decode.1.gated.0.glob.norm.offset',
        'decode.1.gated.0.glob.fc1.weight',
        'decode.1.gated.0.glob.fc1.bias',
        'decode.1.gated.0.glob.token_mix.dwconv_hw.weight',
        'decode.1.gated.0.glob.token_mix.dwconv_hw.bias',
        'decode.1.gated.0.glob.token_mix.dwconv_w.weight',
        'decode.1.gated.0.glob.token_mix.dwconv_w.bias',
        'decode.1.gated.0.glob.token_mix.dwconv_h.weight',
        'decode.1.gated.0.glob.token_mix.dwconv_h.bias',
        'decode.1.gated.0.glob.fc2.weight',
        'decode.1.gated.0.glob.fc2.bias',
        'decode.1.shor.weight',
        'decode.1.shor.bias',
    ),
    load_fn=_load,
)
