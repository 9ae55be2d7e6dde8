"""CUGAN (Real-CUGAN) — cascaded UNets with fixed halo padding.

Parity with resselt/archs/cugan/{__init__.py,arch.py}: UNet1/UNet1x3/UNet2
with valid (pad-0) convs, interior negative-pad crops, SEBlocks, transposed
conv upsampling, and the four top-level variants (2x, 3x, 4x, 2x_fast) with
their reflect halo pads.  ``pro`` checkpoints remap the input range
(arch.py:303-318).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..core import Architecture, KeyCondition, ModelMetadata, SRModel
from ..nn import functional as F
from ..nn.params import PTree


@dataclass(frozen=True)
class CUGANConfig:
    variant: str  # '2x' | '3x' | '4x' | '2x_fast'
    in_channels: int
    out_channels: int
    pro: bool


def _se(p: PTree, x):
    x0 = x.mean(axis=(1, 2), keepdims=True)
    x0 = F.relu(F.conv2d(x0, p['conv1.weight'], p.get('conv1.bias')))
    x0 = F.sigmoid(F.conv2d(x0, p['conv2.weight'], p.get('conv2.bias')))
    return x * x0


def _unet_conv(p: PTree, x, se: bool):
    z = F.leaky_relu(p.conv('conv.0', x), 0.1)
    z = F.leaky_relu(p.conv('conv.2', z), 0.1)
    if se:
        z = _se(p.sub('seblock'), z)
    return z


def _deconv(p: PTree, name: str, x, stride, padding):
    return F.conv_transpose2d(x, p[f'{name}.weight'], p.get(f'{name}.bias'), stride=stride, padding=padding)


def _unet1(p: PTree, x, deconv_k: int):
    """UNet1 / UNet1x3 (cugan/arch.py:99-148, 151-200)."""
    x1 = _unet_conv(p.sub('conv1'), x, se=False)
    x2 = p.conv('conv1_down', x1, stride=2)
    x1 = F.pad2d(x1, (-4, -4, -4, -4))
    x2 = F.leaky_relu(x2, 0.1)
    x2 = _unet_conv(p.sub('conv2'), x2, se=True)
    x2 = _deconv(p, 'conv2_up', x2, 2, 0)
    x2 = F.leaky_relu(x2, 0.1)
    x3 = F.leaky_relu(p.conv('conv3', x1 + x2), 0.1)
    if deconv_k == 4:
        return _deconv(p, 'conv_bottom', x3, 2, 3)
    if deconv_k == 5:
        return _deconv(p, 'conv_bottom', x3, 3, 2)
    return p.conv('conv_bottom', x3)


def _unet2(p: PTree, x):
    """UNet2 (cugan/arch.py:203-252), conv (not deconv) bottom."""
    x1 = _unet_conv(p.sub('conv1'), x, se=False)
    x2 = p.conv('conv1_down', x1, stride=2)
    x1 = F.pad2d(x1, (-16, -16, -16, -16))
    x2 = F.leaky_relu(x2, 0.1)
    x2 = _unet_conv(p.sub('conv2'), x2, se=True)
    x3 = p.conv('conv2_down', x2, stride=2)
    x2 = F.pad2d(x2, (-4, -4, -4, -4))
    x3 = F.leaky_relu(x3, 0.1)
    x3 = _unet_conv(p.sub('conv3'), x3, se=True)
    x3 = _deconv(p, 'conv3_up', x3, 2, 0)
    x3 = F.leaky_relu(x3, 0.1)
    x4 = _unet_conv(p.sub('conv4'), x2 + x3, se=True)
    x4 = _deconv(p, 'conv4_up', x4, 2, 0)
    x4 = F.leaky_relu(x4, 0.1)
    x5 = F.leaky_relu(p.conv('conv5', x1 + x4), 0.1)
    return p.conv('conv_bottom', x5)


def apply(cfg: CUGANConfig, params, x):
    p = PTree(params)
    h0, w0 = x.shape[1], x.shape[2]
    if cfg.pro:
        x = x * 0.7 + 0.15

    if cfg.variant == '2x':
        ph, pw = ((h0 - 1) // 2 + 1) * 2, ((w0 - 1) // 2 + 1) * 2
        x = F.pad2d(x, (18, 18 + pw - w0, 18, 18 + ph - h0), 'reflect')
        x = _unet1(p.sub('unet1'), x, deconv_k=4)
        x0 = _unet2(p.sub('unet2'), x)
        x = x0 + F.pad2d(x, (-20, -20, -20, -20))
        out = x[:, : h0 * 2, : w0 * 2]
    elif cfg.variant == '3x':
        ph, pw = ((h0 - 1) // 4 + 1) * 4, ((w0 - 1) // 4 + 1) * 4
        x = F.pad2d(x, (14, 14 + pw - w0, 14, 14 + ph - h0), 'reflect')
        x = _unet1(p.sub('unet1'), x, deconv_k=5)
        x0 = _unet2(p.sub('unet2'), x)
        x = x0 + F.pad2d(x, (-20, -20, -20, -20))
        out = x[:, : h0 * 3, : w0 * 3]
    elif cfg.variant == '4x':
        x00 = x
        ph, pw = ((h0 - 1) // 2 + 1) * 2, ((w0 - 1) // 2 + 1) * 2
        x = F.pad2d(x, (19, 19 + pw - w0, 19, 19 + ph - h0), 'reflect')
        x = _unet1(p.sub('unet1'), x, deconv_k=4)
        x0 = _unet2(p.sub('unet2'), x)
        x = x0 + F.pad2d(x, (-20, -20, -20, -20))
        x = p.conv('conv_final', x)
        x = F.pixel_shuffle(F.pad2d(x, (-1, -1, -1, -1)), 2)
        out = x[:, : h0 * 4, : w0 * 4] + F.interpolate_nearest(x00, scale_factor=4)
    else:  # 2x_fast
        x00 = x
        ph, pw = ((h0 - 1) // 2 + 1) * 2, ((w0 - 1) // 2 + 1) * 2
        x = F.pad2d(x, (38, 38 + pw - w0, 38, 38 + ph - h0), 'reflect')
        x = F.pixel_unshuffle(x, 2)
        x = _unet1(p.sub('unet1'), x, deconv_k=4)
        x0 = _unet2(p.sub('unet2'), x)
        x = x0 + F.pad2d(x, (-20, -20, -20, -20))
        x = p.conv('conv_final', x)
        x = F.pixel_shuffle(F.pad2d(x, (-1, -1, -1, -1)), 2)
        out = x[:, : h0 * 2, : w0 * 2] + F.interpolate_nearest(x00, scale_factor=2)
    if cfg.pro:
        out = (out - 0.15) / 0.7
    return out


def _load(sd) -> SRModel:
    """Variant dispatch (resselt/archs/cugan/__init__.py:39-77)."""
    pro = 'pro' in sd
    in_channels = sd['unet1.conv1.conv.0.weight'].shape[1]

    if 'conv_final.weight' in sd and in_channels == 12:
        variant, scale = '2x_fast', 2
        in_channels = out_channels = 3
    elif 'conv_final.weight' in sd:
        variant, scale = '4x', 4
        out_channels = 3
    elif sd['unet1.conv_bottom.weight'].shape[2] == 5:
        variant, scale = '3x', 3
        out_channels = sd['unet2.conv_bottom.weight'].shape[0]
    else:
        variant, scale = '2x', 2
        out_channels = sd['unet2.conv_bottom.weight'].shape[0]

    cfg = CUGANConfig(variant=variant, in_channels=in_channels, out_channels=out_channels, pro=pro)
    params = {k: v for k, v in sd.items() if k != 'pro'}
    meta = ModelMetadata(in_channels=in_channels, out_channels=out_channels, upscale=scale, name='CUGAN')
    return SRModel('CuGAN', cfg, params, meta, apply)


ARCH = Architecture(
    id='CuGAN',
    detect_condition=KeyCondition.has_all(
        'unet1.conv1.conv.0.weight',
        'unet1.conv1.conv.2.weight',
        'unet1.conv1_down.weight',
        'unet1.conv2.conv.0.weight',
        'unet1.conv2.conv.2.weight',
        'unet1.conv2.seblock.conv1.weight',
        'unet1.conv2_up.weight',
        'unet1.conv_bottom.weight',
        'unet2.conv1.conv.0.weight',
        'unet2.conv1_down.weight',
        'unet2.conv2.conv.0.weight',
        'unet2.conv2.seblock.conv1.weight',
        'unet2.conv3.conv.0.weight',
        'unet2.conv3.seblock.conv1.weight',
        'unet2.conv3_up.weight',
        'unet2.conv4.conv.0.weight',
        'unet2.conv4_up.weight',
        'unet2.conv5.weight',
        'unet2.conv_bottom.weight',
    ),
    load_fn=_load,
)
