"""Synthetic checkpoint builders.

Generates random state dicts with the exact key/shape layout the detection
tables fingerprint, so benchmarks, demos, and the driver's compile checks
can exercise real load paths without checkpoint files.  Shapes mirror the
reference constructors (cited per builder).
"""

from __future__ import annotations

import numpy as np

from .nn.window import relative_position_index


class _Maker:
    def __init__(self, seed: int = 0, std: float = 0.03):
        self.rng = np.random.default_rng(seed)
        self.std = std
        self.sd: dict[str, np.ndarray] = {}

    def t(self, key: str, *shape: int):
        self.sd[key] = (self.rng.standard_normal(shape) * self.std).astype(np.float32)

    def conv(self, key: str, cout: int, cin: int, k: int = 3, k2: int | None = None, bias: bool = True):
        self.t(f'{key}.weight', cout, cin, k, k2 if k2 is not None else k)
        if bias:
            self.t(f'{key}.bias', cout)


def _conv3xc(m: _Maker, key: str, cin: int, cout: int, gain: int = 2):
    """Conv3XC bundle keys (reference span/arch.py:59-121)."""
    m.conv(f'{key}.sk', cout, cin, 1)
    m.conv(f'{key}.conv.0', cin * gain, cin, 1)
    m.conv(f'{key}.conv.1', cout * gain, cin * gain, 3)
    m.conv(f'{key}.conv.2', cout, cout * gain, 1)
    m.conv(f'{key}.eval_conv', cout, cin, 3)


def make_compact(num_feat: int = 64, num_conv: int = 16, upscale: int = 4, in_nc: int = 3, seed: int = 0):
    """SRVGGNetCompact layout (reference compact/arch.py:37-56)."""
    m = _Maker(seed)
    m.conv('body.0', num_feat, in_nc, 3)
    m.t('body.1.weight', num_feat)
    for i in range(num_conv):
        m.conv(f'body.{2 * i + 2}', num_feat, num_feat, 3)
        m.t(f'body.{2 * i + 3}.weight', num_feat)
    m.conv(f'body.{2 * num_conv + 2}', in_nc * upscale * upscale, num_feat, 3)
    return m.sd


def make_spanplus(feature_channels: int = 48, blocks=(4,), upscale: int = 2, in_nc: int = 3, seed: int = 0):
    """SpanPlus layout, 'ps' upsampler (reference spanplus/arch.py:154-201)."""
    m = _Maker(seed)
    f = feature_channels
    _conv3xc(m, 'feats.0', in_nc, f)
    for bi, n_blocks in enumerate(blocks):
        g = f'feats.{bi + 1}'
        for blk in ['block_1'] + [f'block_n.{i}' for i in range(n_blocks)] + ['block_end']:
            for c in ('c1_r', 'c2_r', 'c3_r'):
                _conv3xc(m, f'{g}.{blk}.{c}', f, f)
        _conv3xc(m, f'{g}.conv_2', f, f)
        m.conv(f'{g}.conv_cat', f, f * 4, 1)
    m.conv('upsampler.0', in_nc * upscale**2, f, 3)
    return m.sd


def make_esrgan(num_filters: int = 64, num_blocks: int = 23, scale: int = 4, in_nc: int = 3, out_nc: int = 3, gc: int = 32, seed: int = 0):
    """RRDBNet old-arch layout (reference esrgan/arch.py:12-138)."""
    import math

    m = _Maker(seed)
    nf = num_filters
    m.conv('model.0', nf, in_nc, 3)
    for b in range(num_blocks):
        for r in (1, 2, 3):
            base = f'model.1.sub.{b}.RDB{r}'
            for ci in range(1, 6):
                cin = nf + (ci - 1) * gc
                cout = gc if ci < 5 else nf
                m.conv(f'{base}.conv{ci}.0', cout, cin, 3)
    m.conv(f'model.1.sub.{num_blocks}', nf, nf, 3)
    n_up = int(math.log2(scale)) if scale != 3 else 1
    for i in range(1, n_up + 1):
        m.conv(f'model.{3 * i}', nf, nf, 3)
    m.conv(f'model.{3 * n_up + 2}', nf, nf, 3)
    m.conv(f'model.{3 * n_up + 4}', out_nc, nf, 3)
    return m.sd


def make_swinir(
    embed_dim: int = 60,
    depths=(6, 6, 6, 6),
    num_heads=(6, 6, 6, 6),
    window_size: int = 8,
    mlp_ratio: float = 2.0,
    upscale: int = 4,
    upsampler: str = 'pixelshuffle',
    in_nc: int = 3,
    seed: int = 0,
):
    """SwinIR layout (reference swinir/arch.py:735-934)."""
    import math

    m = _Maker(seed)
    e = embed_dim
    m.conv('conv_first', e, in_nc, 3)
    m.t('patch_embed.norm.weight', e)
    m.t('patch_embed.norm.bias', e)
    rpi = relative_position_index(window_size, window_size)
    for li, (depth, heads) in enumerate(zip(depths, num_heads)):
        for bi in range(depth):
            b = f'layers.{li}.residual_group.blocks.{bi}'
            for nk in ('norm1', 'norm2'):
                m.t(f'{b}.{nk}.weight', e)
                m.t(f'{b}.{nk}.bias', e)
            m.t(f'{b}.attn.relative_position_bias_table', (2 * window_size - 1) ** 2, heads)
            m.sd[f'{b}.attn.relative_position_index'] = rpi
            m.t(f'{b}.attn.qkv.weight', 3 * e, e)
            m.t(f'{b}.attn.qkv.bias', 3 * e)
            m.t(f'{b}.attn.proj.weight', e, e)
            m.t(f'{b}.attn.proj.bias', e)
            hid = int(e * mlp_ratio)
            m.t(f'{b}.mlp.fc1.weight', hid, e)
            m.t(f'{b}.mlp.fc1.bias', hid)
            m.t(f'{b}.mlp.fc2.weight', e, hid)
            m.t(f'{b}.mlp.fc2.bias', e)
        m.conv(f'layers.{li}.conv', e, e, 3)
    m.t('norm.weight', e)
    m.t('norm.bias', e)
    m.conv('conv_after_body', e, e, 3)
    if upsampler == 'pixelshuffle':
        nf = 64
        m.conv('conv_before_upsample.0', nf, e, 3)
        if upscale & (upscale - 1) == 0:
            for i in range(int(math.log2(upscale))):
                m.conv(f'upsample.{2 * i}', 4 * nf, nf, 3)
        elif upscale == 3:
            m.conv('upsample.0', 9 * nf, nf, 3)
        m.conv('conv_last', in_nc, nf, 3)
    elif upsampler == 'pixelshuffledirect':
        m.conv('upsample.0', in_nc * upscale**2, e, 3)
    else:
        m.conv('conv_last', in_nc, e, 3)
    return m.sd


def make_span(feature_channels: int = 48, upscale: int = 4, in_nc: int = 3, seed: int = 0):
    """SPAN layout (reference span/arch.py:183-234): Conv3XC stem, six SPABs,
    conv_cat/conv_2, pixelshuffle tail."""
    m = _Maker(seed)
    f = feature_channels
    _conv3xc(m, 'conv_1', in_nc, f)
    for b in range(1, 7):
        for c in ('c1_r', 'c2_r', 'c3_r'):
            _conv3xc(m, f'block_{b}.{c}', f, f)
    m.conv('conv_cat', f, 4 * f, 1)
    _conv3xc(m, 'conv_2', f, f)
    m.conv('upsampler.0', in_nc * upscale * upscale, f, 3)
    return m.sd


def make_mosr(
    dim: int = 48,
    n_block: int = 4,
    upscale: int = 2,
    in_nc: int = 3,
    expansion_ratio: float = 1.5,
    conv_ratio: float = 1.0,
    kernel_size: int = 7,
    seed: int = 0,
):
    """MoSR layout, 'ps' upsampler (reference mosr/arch.py:108-156):
    gblocks Sequential = stem conv + GatedCNNBlocks + 5-entry conv tail,
    ConvBlock shortcut."""
    m = _Maker(seed)
    hidden = int(expansion_ratio * dim)
    cc = int(conv_ratio * dim)
    m.conv('gblocks.0', dim, in_nc, 3)
    for i in range(1, n_block + 1):
        m.t(f'gblocks.{i}.norm.weight', dim)
        m.t(f'gblocks.{i}.norm.bias', dim)
        m.conv(f'gblocks.{i}.fc1', hidden * 2, dim, 3)
        m.conv(f'gblocks.{i}.conv', cc, 1, kernel_size)  # depthwise
        m.conv(f'gblocks.{i}.fc2', dim, hidden, 3)
    m.conv(f'gblocks.{n_block + 1}', dim * 2, dim, 3)
    m.conv(f'gblocks.{n_block + 3}', dim, dim * 2, 3)
    m.conv(f'gblocks.{n_block + 5}', dim, dim, 1)
    m.conv('shortcut.block.0', dim, in_nc, 3)
    m.conv('shortcut.block.2', dim, dim, 3)
    m.conv('shortcut.conv11', dim, in_nc, 1)
    m.conv('upsampler.0', in_nc * upscale * upscale, dim, 3)
    return m.sd


ZOO = {
    'compact': make_compact,
    'spanplus': make_spanplus,
    'esrgan': make_esrgan,
    'swinir': make_swinir,
    'span': make_span,
    'mosr': make_mosr,
}
