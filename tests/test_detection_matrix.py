"""Cross-detection matrix: every family's checkpoint must be detected as
itself with the full registry registered, in registration order.

This guards the detection-order hazard called out in SURVEY.md §7.4.6 (the
reference's registration order was os.walk filesystem order; weak
fingerprints like spanplus's single key must not shadow anything)."""

import numpy as np
import pytest
import torch

import resselt_tpu
from resselt_tpu.archs import internal_registry
from tests.torch_ref import state_dict_to_numpy


import functools


@functools.lru_cache(maxsize=1)
def _tiny_models():
    return _build_tiny_models()


def _build_tiny_models():
    """One small torch reference model per family -> expected arch id."""
    from resselt.archs.atd.arch import ATD
    from resselt.archs.compact.arch import SRVGGNetCompact
    from resselt.archs.cugan.arch import UpCunet2x
    from resselt.archs.dat.arch import DAT
    from resselt.archs.drct.arch import DRCT
    from resselt.archs.eimn.arch import eimn
    from resselt.archs.esrgan.arch import RRDBNet
    from resselt.archs.fdat.arch import FDAT
    from resselt.archs.figsr.arch import FIGSR
    from resselt.archs.flexnet.arch import FlexNet
    from resselt.archs.gater.arch import GateR
    from resselt.archs.gaterv2.arch import GateRV2
    from resselt.archs.gaterv3.arch import GateRV3
    from resselt.archs.gfisr.arch import GFISR
    from resselt.archs.gfisrv2.arch import GFISRV2
    from resselt.archs.hat.arch import HAT
    from resselt.archs.lawfft.arch import LAWFFT
    from resselt.archs.moesr.arch import MoESR
    from resselt.archs.mosr.arch import mosr
    from resselt.archs.mosrv2.arch import MoSRv2
    from resselt.archs.omni.arch import OmniSR
    from resselt.archs.plksr.plksr import plksr
    from resselt.archs.plksr.rplksr import realplksr
    from resselt.archs.rcan.arch import RCAN
    from resselt.archs.rgt.arch import RGT
    from resselt.archs.rha.arch import RHA
    from resselt.archs.rtmosr.arch import RTMoSR
    from resselt.archs.smosr.arch import SMoSR
    from resselt.archs.span.arch import SPAN
    from resselt.archs.spanplus.arch import SpanPlus
    from resselt.archs.spanpp.arch import SpanPP
    from resselt.archs.swinir.arch import SwinIR

    d = 16
    return {
        'SPAN': SPAN(num_in_ch=3, num_out_ch=3, feature_channels=d, upscale=2),
        'spanplus': SpanPlus(blocks=[1], feature_channels=d, upscale=2, upsampler='ps'),
        'SpanPP': SpanPP(num_in_ch=3, feature_channels=d, implicit_dim=16, latent_layers=1),
        'Compact': SRVGGNetCompact(num_feat=d, num_conv=2, upscale=2),
        'ESRGAN': RRDBNet(num_filters=d, num_blocks=1, scale=2),
        'CuGAN': UpCunet2x(),
        'PLKSR': plksr(dim=d, n_blocks=1, upscaling_factor=2, kernel_size=5),
        'PLKSR-real': realplksr(dim=d, n_blocks=1, upscaling_factor=2, kernel_size=5, dysample=False),
        'MoSR': mosr(n_block=1, dim=d, upscale=2, upsampler='ps', expansion_ratio=1.5),
        'MoSRv2': MoSRv2(scale=2, n_block=1, dim=d, upsampler='pixelshuffledirect',
                         expansion_ratio=1.5, unshuffle_mod=False, rms_norm=True),
        'SMoSR': SMoSR(dim=d, scale=2, rep=False, n_mb=1, upsampler='pixelshuffledirect', upsampler_mid_dim=8),
        'MoESR': MoESR(dim=d, n_blocks=1, n_block=1, scale=2, upsampler='pixelshuffledirect',
                       expansion_factor=1.5, expansion_msg=1.5, upsample_dim=d),
        'RTMoSR': RTMoSR(scale=2, dim=d, ffn_expansion=2, n_blocks=1),
        'RHA': RHA(dim=d, scale=2, down_list=[1], group_blocks=1, res_blocks=1,
                   expansion_ratio=1.5, window_size=4, upsample='pixelshuffledirect'),
        'SwinIR': SwinIR(img_size=16, embed_dim=24, depths=[1], num_heads=[2], window_size=8,
                         mlp_ratio=1.0, upscale=2, upsampler='pixelshuffledirect'),
        'HAT': HAT(img_size=16, embed_dim=24, depths=(1,), num_heads=(3,), window_size=8,
                   compress_ratio=3, squeeze_factor=8, mlp_ratio=1.0, upscale=2),
        'DRCT': DRCT(img_size=16, embed_dim=24, depths=(1,), num_heads=(3,), window_size=8,
                     mlp_ratio=1.0, upscale=2, upsampler='pixelshuffle', gc=8),
        'dat': DAT(img_size=16, embed_dim=24, split_size=[2, 4], depth=[2], num_heads=[2],
                   expansion_factor=2.0, upscale=2, upsampler='pixelshuffledirect'),
        'RGT': RGT(img_size=16, embed_dim=24, depth=[2], num_heads=[2], mlp_ratio=1.0,
                   upscale=2, split_size=[4, 4]),
        'ATD': ATD(embed_dim=24, depths=(2,), num_heads=(3,), window_size=8, category_size=32,
                   num_tokens=8, reducted_dim=4, convffn_kernel_size=5, mlp_ratio=1.0,
                   upscale=2, upsampler='pixelshuffledirect'),
        'OmniSR': OmniSR(num_feat=d, block_num=1, pe=True, window_size=8, res_num=1, up_scale=2, bias=True),
        'eimn': eimn(embed_dims=d, scale=2, depths=1, mlp_ratios=1.5, num_stages=1),
        'RCAN': RCAN(scale=2, n_resgroups=1, n_resblocks=1, n_feats=d, reduction=4),
        'FlexNet': FlexNet(dim=d, num_blocks=[3], window_size=8, hidden_rate=2,
                           pipeline_type='linear', upsampler='ps', scale=2),
        'GateR': GateR(dim=d, num_blocks=(1, 1, 1, 1, 1, 1, 1)),
        'GateRv2': GateRV2(dim=d, enc_blocks=(1, 1), dec_blocks=(1, 1), num_latent=1, scale=1),
        'GateRV3': GateRV3(dim=d, enc_blocks=(1, 1), dec_blocks=(1, 1), num_latent=1,
                           scale=1, span_blocks=1),
        'GFISR': GFISR(dim=d, n_blocks=5, scale=4, pixel_unshuffle=False, expansion_ratio=1.5),
        'GFISRV2': GFISRV2(dim=d, n_blocks=4, scale=4, pixel_unshuffle=False, expansion_ratio=1.5),
        'FIGSR': FIGSR(dim=d, n_blocks=2, scale=2, gc=4, square_kernel_size=5,
                       band_kernel_size=7, expansion_ratio=2.0),
        'LAWFFT': LAWFFT(dim=d, scale=2, n_rblock=1, n_mblock=2, window_size=8,
                         mlp_factor=2.0, split=0.25),
        'FDAT': FDAT(scale=2, embed_dim=32, num_groups=1, depth_per_group=1, num_heads=4,
                     window_size=8, ffn_expansion_ratio=1.5, aim_reduction_ratio=8,
                     upsampler_type='pixelshuffledirect', mid_dim=32),
    }


def test_all_families_detect_as_themselves():
    torch.manual_seed(0)
    models = _tiny_models()
    assert len(internal_registry) == 31
    failures = []
    for expect_id, model in models.items():
        expect = expect_id.split('-')[0]
        sd = state_dict_to_numpy(model.eval().state_dict())
        matches = [a.id for a in internal_registry if a.detect(sd)]
        if not matches or matches[0] != expect:
            failures.append((expect_id, matches))
            continue
        loaded = resselt_tpu.load_from_state_dict(sd)
        if loaded.arch_id != expect:
            failures.append((expect_id, loaded.arch_id))
    assert not failures, f'detection failures: {failures}'
