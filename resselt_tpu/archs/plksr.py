"""PLKSR / RealPLKSR — Partial Large Kernel CNNs for Efficient SR.

Parity with resselt/archs/plksr/{__init__.py,plksr.py,rplksr.py}.
The partial-LK convs operate on the first ``pdim`` channels only
(plksr.py:54-94); sparse variants sum multiple dilated convs at eval time
(plksr.py:122-177).  The loader's undetectable sparse params use the same
documented defaults as the reference (plksr/__init__.py:58-76).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..core.state_dict import get_seq_len, pixelshuffle_scale
from ..nn import functional as F
from ..nn.params import PTree
from ..nn.upsample import dysample


@dataclass(frozen=True)
class PLKSRConfig:
    variant: str  # 'plksr' | 'realplksr'
    dim: int
    n_blocks: int
    upscale: int
    ccm_type: str  # plksr only
    lk_type: str  # plksr only: 'PLK' | 'SparsePLK' | 'RectSparsePLK'
    use_ea: bool
    norm_groups: int = 4  # realplksr only
    dys: bool = False  # realplksr only
    sparse_dilations: tuple[int, ...] = (1, 2, 3, 4)
    n_sparse_convs: int = 0


def _partial(x, pdim, fn):
    x1, x2 = x[..., :pdim], x[..., pdim:]
    return jnp.concatenate([fn(x1), x2], axis=-1)


def _plk_conv(p: PTree, x1):
    """The kxk partial large-kernel conv (plksr.py:54-81) — the measured
    hot spot: at PLKSR-S shapes (17x17, 16ch, 256^2, b8) XLA runs it at 6.9
    useful TFLOPS and it is ~83% of the model's runtime.  On TPU it
    dispatches to the column-packed Pallas kernel (2x: 5.7 ms vs 11.9,
    ops/fused_conv.py::fused_conv_lk); elsewhere / on unsupported shapes it
    falls back to XLA."""
    import jax

    w = p['conv.weight']
    k = w.shape[-1]
    cin, cout = w.shape[1], w.shape[0]
    if jax.default_backend() != 'cpu' and w.shape[-2] == k:
        from ..ops.fused_conv import fused_conv_lk, lk_conv_available

        if lk_conv_available(cin, cout, k) and x1.shape[1] >= 8 and x1.shape[2] >= 128:
            return fused_conv_lk(x1, w, p.get('conv.bias'), k=k).astype(x1.dtype)
    return p.conv('conv', x1, padding='same')


def _lk(p: PTree, x, cfg: PLKSRConfig):
    if cfg.lk_type == 'PLK':
        pdim = p['conv.weight'].shape[0]
        return _partial(x, pdim, lambda x1: _plk_conv(p, x1))
    if cfg.lk_type == 'RectSparsePLK':
        pdim = p['mn_conv.weight'].shape[0]

        def fn(x1):
            mk, nk = p['mn_conv.weight'].shape[-2:]
            return (
                p.conv('mn_conv', x1, padding=(mk // 2, nk // 2))
                + p.conv('nm_conv', x1, padding=(nk // 2, mk // 2))
                + p.conv('nn_conv', x1, padding=(nk // 2, nk // 2))
            )

        return _partial(x, pdim, fn)
    # SparsePLK: sum of dilated convs (dilations from the default table)
    pdim = p['convs.0.weight'].shape[0]

    def fn(x1):
        out = 0.0
        for i in range(cfg.n_sparse_convs):
            k = p[f'convs.{i}.weight'].shape[-1]
            d = cfg.sparse_dilations[i] if i < len(cfg.sparse_dilations) else 1
            out = out + p.conv(f'convs.{i}', x1, padding=(k // 2) * d, dilation=d)
        return out

    return _partial(x, pdim, fn)


def _plk_block(p: PTree, x, cfg: PLKSRConfig):
    x_skip = x
    if cfg.variant == 'plksr':
        mixer = p.sub('channe_mixer')  # reference typo (plksr.py:326 class)
        k0 = mixer.shape('0.weight')[-1]
        x = mixer.conv('0', x, padding=k0 // 2)
        x = F.gelu(x)
        k2 = mixer.shape('2.weight')[-1]
        x = mixer.conv('2', x, padding=k2 // 2)
    else:
        mixer = p.sub('channel_mixer')
        x = mixer.conv('0', x, padding=1)
        x = F.mish(x)
        x = mixer.conv('2', x, padding=1)
    x = _lk(p.sub('lk'), x, cfg)
    if cfg.use_ea:
        x = x * F.sigmoid(p.conv('attn.f.0', x, padding=1))
    x = p.conv('refine', x)
    if cfg.variant == 'realplksr':
        x = F.group_norm(x, cfg.norm_groups, p['norm.weight'], p['norm.bias'])
    return x + x_skip


def apply(cfg: PLKSRConfig, params, x):
    p = PTree(params)
    s = cfg.upscale
    feat = p.conv('feats.0', x, padding=1)
    for i in range(cfg.n_blocks):
        feat = _plk_block(p.sub(f'feats.{i + 1}'), feat, cfg)
    last = cfg.n_blocks + 1 if cfg.variant == 'plksr' else cfg.n_blocks + 2
    feat = p.conv(f'feats.{last}', feat, padding=1)
    feat = feat + jnp.repeat(x, s * s, axis=-1)
    if cfg.dys:
        groups = x.shape[-1] if s % 2 != 0 else 4
        return dysample(p.sub('to_img'), feat, s, groups=groups, end_convolution=s != 1)
    return F.pixel_shuffle(feat, s)


def _load(sd) -> SRModel:
    """Config inference (resselt/archs/plksr/__init__.py:30-122)."""
    in_nc = sd['feats.0.weight'].shape[1]
    out_nc = in_nc
    dim = sd['feats.0.weight'].shape[0]
    total_feat_layers = get_seq_len(sd, 'feats')
    use_ea = 'feats.1.attn.f.0.weight' in sd
    scale = pixelshuffle_scale(sd[f'feats.{total_feat_layers - 1}.weight'].shape[0], out_nc)

    if 'feats.1.channe_mixer.0.weight' in sd:
        n_blocks = total_feat_layers - 2
        m0 = sd['feats.1.channe_mixer.0.weight'].shape[2]
        m2 = sd['feats.1.channe_mixer.2.weight'].shape[2]
        ccm_type = {(3, 1): 'CCM', (3, 3): 'DCCM', (1, 3): 'ICCM'}.get((m0, m2))
        if ccm_type is None:
            raise ValueError('Unknown CCM type')
        if 'feats.1.lk.conv.weight' in sd:
            lk_type = 'PLK'
        elif 'feats.1.lk.convs.0.weight' in sd:
            lk_type = 'SparsePLK'
        elif 'feats.1.lk.mn_conv.weight' in sd:
            lk_type = 'RectSparsePLK'
        else:
            raise ValueError('Unknown LK type')
        n_sparse = get_seq_len(sd, 'feats.1.lk.convs') if lk_type == 'SparsePLK' else 0
        cfg = PLKSRConfig(
            variant='plksr', dim=dim, n_blocks=n_blocks, upscale=scale,
            ccm_type=ccm_type, lk_type=lk_type, use_ea=use_ea, n_sparse_convs=n_sparse,
        )
        name = 'PLKSR'
    elif 'feats.1.channel_mixer.0.weight' in sd:
        n_blocks = total_feat_layers - 3
        cfg = PLKSRConfig(
            variant='realplksr', dim=dim, n_blocks=n_blocks, upscale=scale,
            ccm_type='DCCM', lk_type='PLK', use_ea=use_ea,
            norm_groups=4, dys='to_img.init_pos' in sd,
        )
        name = 'RealPLKSR'
    else:
        raise ValueError('Unknown model type')

    meta = ModelMetadata(in_channels=in_nc, out_channels=out_nc, upscale=scale, name=name)
    model = SRModel('PLKSR', cfg, dict(sd), meta, apply)
    # halo 4 seams at 63.7 dB (max pixel err well under 1/255; the 17x17
    # partial convs widen the receptive field vs other conv models but
    # stay invisible): 27.4 vs 23.4 f32 / 31.7 vs 26.5 bf16 MP/s 720p t256
    model.serving_halo = 4
    return model


ARCH = Architecture(
    id='PLKSR',
    detect_condition=KeyCondition.has_all(
        'feats.0.weight',
        KeyCondition.has_any(
            'feats.1.lk.conv.weight',
            'feats.1.lk.convs.0.weight',
            'feats.1.lk.mn_conv.weight',
        ),
        'feats.1.refine.weight',
        KeyCondition.has_any(
            'feats.1.channe_mixer.0.weight',
            'feats.1.channel_mixer.0.weight',
        ),
    ),
    load_fn=_load,
)
