"""Load-time reparameterization collapses.

The reference recomputes these fusions at every forward in eval mode (e.g.
Conv3XC.update_params, resselt/archs/span/arch.py:124-154); here each is a
pure numpy weight-space transform executed once at load.  All functions take
and return OIHW numpy weights.
"""

from __future__ import annotations

import numpy as np


def compose_1x1_kxk(w1: np.ndarray, b1, w2: np.ndarray, b2):
    """Fuse ``conv1x1(w1) -> convkxk(w2)`` into one kxk conv."""
    # w1: (M, I, 1, 1), w2: (O, M, kh, kw)
    w = np.einsum('mi,omhw->oihw', w1[:, :, 0, 0], w2)
    b = (w2 * b1.reshape(1, -1, 1, 1)).sum(axis=(1, 2, 3)) + b2
    return w, b


def compose_kxk_1x1(w1: np.ndarray, b1, w2: np.ndarray, b2):
    """Fuse ``convkxk(w1) -> conv1x1(w2)`` into one kxk conv."""
    # w1: (M, I, kh, kw), w2: (O, M, 1, 1)
    w = np.einsum('om,mihw->oihw', w2[:, :, 0, 0], w1)
    b = (w2 * b1.reshape(1, -1, 1, 1)).sum(axis=(1, 2, 3)) + b2
    return w, b


def pad_kernel_to(w: np.ndarray, k: int) -> np.ndarray:
    """Zero-pad a smaller odd kernel to k x k, centered."""
    kh, kw = w.shape[-2:]
    ph, pw = (k - kh) // 2, (k - kw) // 2
    return np.pad(w, ((0, 0), (0, 0), (ph, k - kh - ph), (pw, k - kw - pw)))


def conv3xc_collapse(sd, prefix: str) -> tuple[np.ndarray, np.ndarray]:
    """Collapse a Conv3XC bundle (1x1 -> 3x3 -> 1x1 plus 1x1 skip) into a
    single 3x3 conv (reference: resselt/archs/span/arch.py:124-150)."""
    w1, b1 = np.asarray(sd[f'{prefix}.conv.0.weight'], np.float64), np.asarray(sd[f'{prefix}.conv.0.bias'], np.float64)
    w2, b2 = np.asarray(sd[f'{prefix}.conv.1.weight'], np.float64), np.asarray(sd[f'{prefix}.conv.1.bias'], np.float64)
    w3, b3 = np.asarray(sd[f'{prefix}.conv.2.weight'], np.float64), np.asarray(sd[f'{prefix}.conv.2.bias'], np.float64)

    w_mid, b_mid = compose_1x1_kxk(w1, b1, w2, b2)
    w_full, b_full = compose_kxk_1x1(w_mid, b_mid, w3, b3)

    sk_w = np.asarray(sd[f'{prefix}.sk.weight'], np.float64)
    sk_b = np.asarray(sd[f'{prefix}.sk.bias'], np.float64)
    w_full = w_full + pad_kernel_to(sk_w, 3)
    b_full = b_full + sk_b
    return w_full.astype(np.float32), b_full.astype(np.float32)
