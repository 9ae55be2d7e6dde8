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
    img_size: int = 64,
    seed: int = 0,
):
    """SwinIR layout (reference swinir/arch.py:735-934), incl. the per-
    shifted-block ``attn_mask`` buffers the reference registers at its
    training resolution (arch.py:268-293)."""
    import math

    from .nn.window import swin_attn_mask

    m = _Maker(seed)
    e = embed_dim
    m.conv('conv_first', e, in_nc, 3)
    m.t('patch_embed.norm.weight', e)
    m.t('patch_embed.norm.bias', e)
    rpi = relative_position_index(window_size, window_size)
    # the reference registers shift masks only when the training resolution
    # tiles evenly into shifted windows (swinir/arch.py:234-293); ws=7
    # classical configs and img_size <= ws carry no attn_mask keys
    mask = None
    if img_size > window_size and img_size % window_size == 0:
        mask = swin_attn_mask(img_size, img_size, window_size, window_size // 2)
    for li, (depth, heads) in enumerate(zip(depths, num_heads)):
        for bi in range(depth):
            b = f'layers.{li}.residual_group.blocks.{bi}'
            if bi % 2 == 1 and mask is not None:
                m.sd[f'{b}.attn_mask'] = mask
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


def _rpi_oca(ws: int, owin: int) -> np.ndarray:
    """HAT OCA relative position index (reference hat/arch.py:1005-1034)."""
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing='ij')).reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(owin), np.arange(owin), indexing='ij')).reshape(2, -1)
    rel = (ce[:, None, :] - co[:, :, None]).transpose(1, 2, 0).astype(np.int64)
    rel += ws - owin + 1
    rel[:, :, 0] *= ws + owin - 1
    return rel.sum(-1)


def make_hat(
    embed_dim: int = 48,
    depths=(2,),
    num_heads=(4,),
    window_size: int = 8,
    overlap_ratio: float = 0.5,
    compress_ratio: int = 4,
    squeeze_factor: int = 8,
    mlp_ratio: float = 2.0,
    upscale: int = 2,
    num_feat: int = 32,
    in_nc: int = 3,
    seed: int = 0,
):
    """HAT layout (reference hat/arch.py:798-985): HAB blocks (window attn +
    CAB), one OCAB per group, pixelshuffle tail, rpi buffers."""
    import math

    m = _Maker(seed)
    e = embed_dim
    ws = window_size
    owin = ws + int(overlap_ratio * ws)
    m.conv('conv_first', e, in_nc, 3)
    m.sd['relative_position_index_SA'] = relative_position_index(ws, ws)
    m.sd['relative_position_index_OCA'] = _rpi_oca(ws, owin)
    for li, (depth, heads) in enumerate(zip(depths, num_heads)):
        for bi in range(depth):
            b = f'layers.{li}.residual_group.blocks.{bi}'
            for nk in ('norm1', 'norm2'):
                m.t(f'{b}.{nk}.weight', e)
                m.t(f'{b}.{nk}.bias', e)
            m.t(f'{b}.attn.relative_position_bias_table', (2 * ws - 1) ** 2, heads)
            m.t(f'{b}.attn.qkv.weight', 3 * e, e)
            m.t(f'{b}.attn.qkv.bias', 3 * e)
            m.t(f'{b}.attn.proj.weight', e, e)
            m.t(f'{b}.attn.proj.bias', e)
            m.conv(f'{b}.conv_block.cab.0', e // compress_ratio, e, 3)
            m.conv(f'{b}.conv_block.cab.2', e, e // compress_ratio, 3)
            m.conv(f'{b}.conv_block.cab.3.attention.1', e // squeeze_factor, e, 1)
            m.conv(f'{b}.conv_block.cab.3.attention.3', e, e // squeeze_factor, 1)
            hid = int(e * mlp_ratio)
            m.t(f'{b}.mlp.fc1.weight', hid, e)
            m.t(f'{b}.mlp.fc1.bias', hid)
            m.t(f'{b}.mlp.fc2.weight', e, hid)
            m.t(f'{b}.mlp.fc2.bias', e)
        o = f'layers.{li}.residual_group.overlap_attn'
        for nk in ('norm1', 'norm2'):
            m.t(f'{o}.{nk}.weight', e)
            m.t(f'{o}.{nk}.bias', e)
        m.t(f'{o}.relative_position_bias_table', (ws + owin - 1) ** 2, heads)
        m.t(f'{o}.qkv.weight', 3 * e, e)
        m.t(f'{o}.qkv.bias', 3 * e)
        m.t(f'{o}.proj.weight', e, e)
        m.t(f'{o}.proj.bias', e)
        hid = int(e * mlp_ratio)
        m.t(f'{o}.mlp.fc1.weight', hid, e)
        m.t(f'{o}.mlp.fc1.bias', hid)
        m.t(f'{o}.mlp.fc2.weight', e, hid)
        m.t(f'{o}.mlp.fc2.bias', e)
        m.conv(f'layers.{li}.conv', e, e, 3)
    m.t('norm.weight', e)
    m.t('norm.bias', e)
    m.conv('conv_after_body', e, e, 3)
    m.conv('conv_before_upsample.0', num_feat, e, 3)
    for i in range(int(math.log2(upscale))):
        m.conv(f'upsample.{2 * i}', 4 * num_feat, num_feat, 3)
    m.conv('conv_last', in_nc, num_feat, 3)
    return m.sd


def make_atd(
    embed_dim: int = 48,
    depths=(2,),
    num_heads=(4,),
    window_size: int = 8,
    num_tokens: int = 16,
    reducted_dim: int = 8,
    convffn_kernel_size: int = 5,
    mlp_ratio: float = 1.0,
    upscale: int = 2,
    in_nc: int = 3,
    seed: int = 0,
):
    """ATD layout, pixelshuffledirect tail (reference atd/arch.py:829-1035):
    per-group token dictionary ``td``, per-layer sigma / attn_atd / attn_aca
    / attn_win / convffn parameter sets."""
    m = _Maker(seed)
    e = embed_dim
    ws = window_size
    m.conv('conv_first', e, in_nc, 3)
    m.sd['relative_position_index_SA'] = relative_position_index(ws, ws)
    for li, (depth, heads) in enumerate(zip(depths, num_heads)):
        g = f'layers.{li}.residual_group'
        m.t(f'{g}.td', num_tokens, e)
        for bi in range(depth):
            b = f'{g}.layers.{bi}'
            if bi < depth - 1:  # last layer per group has no td refresh
                m.t(f'{b}.sigma', num_tokens, 1)
                m.t(f'{b}.norm3.weight', num_tokens)
                m.t(f'{b}.norm3.bias', num_tokens)
            for nk in ('norm1', 'norm2'):
                m.t(f'{b}.{nk}.weight', e)
                m.t(f'{b}.{nk}.bias', e)
            m.t(f'{b}.wqkv.weight', 3 * e, e)
            m.t(f'{b}.wqkv.bias', 3 * e)
            m.t(f'{b}.attn_win.relative_position_bias_table', (2 * ws - 1) ** 2, heads)
            m.t(f'{b}.attn_win.proj.weight', e, e)
            m.t(f'{b}.attn_win.proj.bias', e)
            m.t(f'{b}.attn_atd.scale', num_tokens)
            for wk, od in (('wq', reducted_dim), ('wk', reducted_dim), ('wv', e)):
                m.t(f'{b}.attn_atd.{wk}.weight', od, e)
                m.t(f'{b}.attn_atd.{wk}.bias', od)
            m.t(f'{b}.attn_aca.logit_scale', 1, 1)
            m.t(f'{b}.attn_aca.proj.weight', e, e)
            m.t(f'{b}.attn_aca.proj.bias', e)
            hid = int(e * mlp_ratio)
            m.t(f'{b}.convffn.fc1.weight', hid, e)
            m.t(f'{b}.convffn.fc1.bias', hid)
            m.conv(f'{b}.convffn.dwconv.depthwise_conv.0', hid, 1, convffn_kernel_size)
            m.t(f'{b}.convffn.fc2.weight', e, hid)
            m.t(f'{b}.convffn.fc2.bias', e)
        m.conv(f'layers.{li}.conv', e, e, 3)
    m.t('norm.weight', e)
    m.t('norm.bias', e)
    m.conv('conv_after_body', e, e, 3)
    m.conv('upsample.0', in_nc * upscale**2, e, 3)
    return m.sd


def make_plksr(
    dim: int = 64,
    n_blocks: int = 4,
    upscale: int = 4,
    kernel_size: int = 17,
    split_ratio: float = 0.25,
    in_nc: int = 3,
    seed: int = 0,
):
    """PLKSR layout with DCCM mixer + EA attention (reference
    plksr/plksr.py:326-377): 17x17 partial large-kernel conv per block."""
    m = _Maker(seed)
    d = dim
    pk = int(d * split_ratio)
    m.conv('feats.0', d, in_nc, 3)
    for i in range(1, n_blocks + 1):
        m.conv(f'feats.{i}.channe_mixer.0', 2 * d, d, 3)
        m.conv(f'feats.{i}.channe_mixer.2', d, 2 * d, 3)
        m.conv(f'feats.{i}.lk.conv', pk, pk, kernel_size)
        m.conv(f'feats.{i}.attn.f.0', d, d, 3)
        m.conv(f'feats.{i}.refine', d, d, 1)
    m.conv(f'feats.{n_blocks + 1}', in_nc * upscale**2, d, 3)
    return m.sd


def make_gater(dim: int = 16, num_blocks=(1, 1, 1, 1, 1, 1, 1), in_nc: int = 3, seed: int = 0):
    """GateR restoration U-net layout, 1x (reference gater/arch.py:162-200):
    enc0/enc1/enc2/latent/dec0/dec1/dec2 stages of GatedCNNBlocks with
    PixelUnshuffle/Shuffle stage transitions."""
    m = _Maker(seed)
    d = dim

    def gated(prefix: str, width: int, n: int):
        h = int(width * 8 / 3)
        for i in range(n):
            b = f'{prefix}.{i}'
            m.t(f'{b}.norm.weight', width)
            m.t(f'{b}.fc1.weight', 2 * h, width)
            m.t(f'{b}.fc1.bias', 2 * h)
            m.conv(f'{b}.conv.conv', width, 1, 7)
            m.t(f'{b}.fc2.weight', width, h)
            m.t(f'{b}.fc2.bias', width)

    m.conv('in_to_dim', d, in_nc, 3)
    gated('enc0.gated', d, num_blocks[0])
    m.conv('enc1.0.body.0', d // 2, d, 3)
    gated('enc1.1.gated', 2 * d, num_blocks[1])
    m.conv('enc2.0.body.0', d, 2 * d, 3)
    gated('enc2.1.gated', 4 * d, num_blocks[2])
    m.conv('latent.0.body.0', 2 * d, 4 * d, 3)
    gated('latent.1.gated', 8 * d, num_blocks[3])
    m.conv('latent.2.body.0', 16 * d, 8 * d, 3)
    m.conv('dec0.0', 4 * d, 8 * d, 1)
    gated('dec0.1.gated', 4 * d, num_blocks[4])
    m.conv('dec0.2.body.0', 8 * d, 4 * d, 3)
    m.conv('dec1.0', 2 * d, 4 * d, 1)
    gated('dec1.1.gated', 2 * d, num_blocks[5])
    m.conv('dec1.2.body.0', 4 * d, 2 * d, 3)
    gated('dec2.0.gated', 2 * d, num_blocks[6])
    m.conv('dim_to_ch.0', d, 2 * d, 3)
    m.conv('dim_to_ch.1', in_nc, d, 3)
    return m.sd


ZOO = {
    'compact': make_compact,
    'spanplus': make_spanplus,
    'esrgan': make_esrgan,
    'swinir': make_swinir,
    'span': make_span,
    'mosr': make_mosr,
    'hat': make_hat,
    'atd': make_atd,
    'plksr': make_plksr,
    'gater': make_gater,
}
