"""GateR — gated CNN restoration U-Net (1x).

Parity with resselt/archs/gater/{__init__.py,arch.py}: RMSNorm gated CNN
blocks (DConv dw7 or FLPVT2 global focused linear attention in the latent),
PixelUnshuffle/Shuffle scale stages, residual 1x output, pad-to-8 reflect.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len
from ..nn import functional as F
from ..nn.params import PTree


@dataclass(frozen=True)
class GateRConfig:
    dim: int
    in_ch: int
    num_blocks: tuple[int, ...]
    latent_att: bool


def flpvt2(p: PTree, x, h: int, w: int):
    """FLPVT2 global focused linear attention (gater/arch.py:19-90);
    x: (B, N, C). Learned per-dim focusing factor."""
    b, n, c = x.shape
    hd = p['dwc.weight'].shape[0]
    nh = c // hd
    q = F.linear(x, p['q.weight'], p.get('q.bias'))
    kv = F.linear(x, p['kv.weight'], p.get('kv.bias'))
    k, v = kv[..., :c], kv[..., c:]

    scale = jax.nn.softplus(p['scale'].astype(x.dtype))
    ff = p['focusing_factor'].astype(x.dtype)
    q = (F.relu(q) + 1e-6) / scale
    k = (F.relu(k) + 1e-6) / scale
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    kn = jnp.linalg.norm(k, axis=-1, keepdims=True)
    q = q**ff
    k = k**ff
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * qn
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * kn

    q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)

    z = 1.0 / (jnp.einsum('bhnd,bhmd->bhnm', q, k.mean(axis=2, keepdims=True)) + 1e-6)
    kvm = jnp.einsum('bhnd,bhne->bhde', k * (n**-0.5), v * (n**-0.5), preferred_element_type=jnp.float32).astype(x.dtype)
    out = jnp.einsum('bhnd,bhde->bhne', q, kvm, preferred_element_type=jnp.float32).astype(x.dtype) * z
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)

    v_img = v.reshape(b * nh, h, w, hd)
    dwc = F.conv2d(v_img, p['dwc.weight'], p.get('dwc.bias'), padding=p['dwc.weight'].shape[-1] // 2, groups=hd)
    out = out + dwc.reshape(b, nh, n, hd).transpose(0, 2, 1, 3).reshape(b, n, c)
    return F.linear(out, p['proj.weight'], p.get('proj.bias'))


def gated_block(p: PTree, x, h: int, w: int, att: bool):
    """GatedCNNBlock (gater/arch.py:90-130); x: (B, N, C), no inner residual."""
    b, n, c = x.shape
    x = F.rms_norm(x, p['norm.weight'], eps=1e-6)
    x = p.linear('fc1', x)
    hidden = (x.shape[-1]) // 2
    g = x[..., :hidden]
    i = x[..., hidden : 2 * hidden - c]
    cc = x[..., 2 * hidden - c :]
    if att:
        cc = flpvt2(p.sub('conv'), cc, h, w)
    else:
        img = cc.reshape(b, h, w, c)
        cc = p.conv('conv.conv', img, padding=3, groups=c).reshape(b, n, c)
    x = p.linear('fc2', F.mish(g) * jnp.concatenate([i, cc], axis=-1))
    return x


def blocks(p: PTree, x_img, n_block: int, att: bool = False):
    """Blocks with per-block residual (gater/arch.py:133-142); x_img NHWC."""
    b, h, w, c = x_img.shape
    x = x_img.reshape(b, h * w, c)
    for i in range(n_block):
        x = gated_block(p.sub(f'gated.{i}'), x, h, w, att) + x
    return x.reshape(b, h, w, c)


def down(p: PTree, name: str, x):
    return F.pixel_unshuffle(p.conv(f'{name}.body.0', x, padding=1), 2)


def up(p: PTree, name: str, x):
    return F.pixel_shuffle(p.conv(f'{name}.body.0', x, padding=1), 2)


def apply(cfg: GateRConfig, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    x = F.pad_to_multiple(x, 8, mode='reflect')

    enc = p.conv('in_to_dim', x, padding=1)
    enc0 = blocks(p.sub('enc0'), enc, cfg.num_blocks[0])
    enc1 = blocks(p.sub('enc1.1'), down(p, 'enc1.0', enc0), cfg.num_blocks[1])
    enc2 = blocks(p.sub('enc2.1'), down(p, 'enc2.0', enc1), cfg.num_blocks[2])

    latent = up(p, 'latent.2', blocks(p.sub('latent.1'), down(p, 'latent.0', enc2), cfg.num_blocks[3], cfg.latent_att))

    d = p.conv('dec0.0', jnp.concatenate([latent, enc2], axis=-1))
    dec0 = up(p, 'dec0.2', blocks(p.sub('dec0.1'), d, cfg.num_blocks[4]))
    d = p.conv('dec1.0', jnp.concatenate([dec0, enc1], axis=-1))
    dec1 = up(p, 'dec1.2', blocks(p.sub('dec1.1'), d, cfg.num_blocks[5]))
    dec2 = blocks(p.sub('dec2.0'), jnp.concatenate([dec1, enc0], axis=-1), cfg.num_blocks[6])

    out = p.conv('dim_to_ch.0', dec2, padding=1)
    out = p.conv('dim_to_ch.1', out, padding=1)
    return (out + x)[:, :h0, :w0, :]


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/gater/__init__.py:84-91)."""
    block_list = ['enc0', 'enc1.1', 'enc2.1', 'latent.1', 'dec0.1', 'dec1.1', 'dec2.0']
    dim, in_ch = sd['in_to_dim.weight'].shape[:2]
    num_blocks = tuple(get_seq_len(sd, b + '.gated') for b in block_list)
    latent_att = 'latent.1.gated.0.conv.conv.weight' not in sd

    cfg = GateRConfig(dim=dim, in_ch=in_ch, num_blocks=num_blocks, latent_att=latent_att)
    meta = ModelMetadata(in_channels=in_ch, out_channels=in_ch, upscale=1, name='GateR')
    return SRModel('GateR', cfg, dict(sd), meta, apply)


ARCH = Architecture(
    id='GateR',
    detect_condition=KeyCondition.has_all(
        'dec0.0.bias',
        'dec0.0.weight',
        'dec0.1.gated.0.conv.conv.bias',
        'dec0.1.gated.0.conv.conv.weight',
        'dec0.1.gated.0.fc1.bias',
        'dec0.1.gated.0.fc1.weight',
        'dec0.1.gated.0.fc2.bias',
        'dec0.1.gated.0.fc2.weight',
        'dec0.1.gated.0.norm.weight',
        'dec0.2.body.0.bias',
        'dec0.2.body.0.weight',
        'dec1.0.bias',
        'dec1.0.weight',
        'dec1.1.gated.0.conv.conv.bias',
        'dec1.1.gated.0.conv.conv.weight',
        'dec1.1.gated.0.fc1.bias',
        'dec1.1.gated.0.fc1.weight',
        'dec1.1.gated.0.fc2.bias',
        'dec1.1.gated.0.fc2.weight',
        'dec1.1.gated.0.norm.weight',
        'dec1.2.body.0.bias',
        'dec1.2.body.0.weight',
        'dec2.0.gated.0.conv.conv.bias',
        'dec2.0.gated.0.conv.conv.weight',
        'dec2.0.gated.0.fc1.bias',
        'dec2.0.gated.0.fc1.weight',
        'dec2.0.gated.0.fc2.bias',
        'dec2.0.gated.0.fc2.weight',
        'dec2.0.gated.0.norm.weight',
        'dim_to_ch.0.bias',
        'dim_to_ch.0.weight',
        'dim_to_ch.1.bias',
        'dim_to_ch.1.weight',
        'enc0.gated.0.conv.conv.bias',
        'enc0.gated.0.conv.conv.weight',
        'enc0.gated.0.fc1.bias',
        'enc0.gated.0.fc1.weight',
        'enc0.gated.0.fc2.bias',
        'enc0.gated.0.fc2.weight',
        'enc0.gated.0.norm.weight',
        'enc1.0.body.0.bias',
        'enc1.0.body.0.weight',
        'enc1.1.gated.0.conv.conv.bias',
        'enc1.1.gated.0.conv.conv.weight',
        'enc1.1.gated.0.fc1.bias',
        'enc1.1.gated.0.fc1.weight',
        'enc1.1.gated.0.fc2.bias',
        'enc1.1.gated.0.fc2.weight',
        'enc1.1.gated.0.norm.weight',
        'enc2.0.body.0.bias',
        'enc2.0.body.0.weight',
        'enc2.1.gated.0.conv.conv.bias',
        'enc2.1.gated.0.conv.conv.weight',
        'enc2.1.gated.0.fc1.bias',
        'enc2.1.gated.0.fc1.weight',
        'enc2.1.gated.0.fc2.bias',
        'enc2.1.gated.0.fc2.weight',
        'enc2.1.gated.0.norm.weight',
        'in_to_dim.bias',
        'in_to_dim.weight',
        'latent.0.body.0.bias',
        'latent.0.body.0.weight',
        'latent.1.gated.0.fc1.bias',
        'latent.1.gated.0.fc1.weight',
        'latent.1.gated.0.fc2.bias',
        'latent.1.gated.0.fc2.weight',
        'latent.1.gated.0.norm.weight',
        'latent.2.body.0.bias',
        'latent.2.body.0.weight',
    ),
    load_fn=_load,
)
