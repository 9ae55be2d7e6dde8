from .fused_conv import fused_conv3x3_act, fused_conv3x3_pack2, pallas_conv_available

__all__ = ['fused_conv3x3_act', 'fused_conv3x3_pack2', 'pallas_conv_available']
