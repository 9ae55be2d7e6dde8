from .fused_conv import (
    fused_conv3x3_act,
    fused_conv3x3_pack2,
    fused_conv_lk,
    lk_conv_available,
    lk_conv_supported,
    pallas_conv_available,
)
from .window_attention import window_mha_pallas

__all__ = [
    'fused_conv3x3_act',
    'fused_conv3x3_pack2',
    'fused_conv_lk',
    'lk_conv_available',
    'lk_conv_supported',
    'pallas_conv_available',
    'window_mha_pallas',
]
