from .fused_conv import fused_conv3x3_act, pallas_conv_available

__all__ = ['fused_conv3x3_act', 'pallas_conv_available']
