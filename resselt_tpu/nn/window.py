"""Shifted-window attention primitives (SwinIR lineage).

All geometry (relative position indices, shift masks) is computed in numpy
at trace time — input shapes are static under jit, so masks become XLA
constants; no data-dependent control flow reaches the device.

Parity reference: resselt/archs/swinir/arch.py:43-72 (partition/reverse),
:75-173 (WindowAttention), :268-293 (calculate_mask).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import functional as F


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C), row-major window order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Swin relative position index table, (wh*ww, wh*ww) int."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing='ij'))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def swin_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray | None:
    """SW-MSA additive mask, (nW, ws*ws, ws*ws) f32 with 0 / -100 entries."""
    if shift == 0:
        return None
    img_mask = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    m = img_mask.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    # torch builds the mask as (m.unsqueeze(1) - m.unsqueeze(2)) -> diff[w, i, j] = m[w, j] - m[w, i]
    mask = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
    return mask


_FUSED_ATTENTION = True
_PACKED_ATTENTION = False
_CHUNKED_ATTENTION = True


def chunked_attention_enabled() -> bool:
    return _CHUNKED_ATTENTION


def use_chunked_attention(on: bool) -> None:
    """Split large window batches into ~64-window chunks before the XLA
    attention einsums.  XLA's batched attention fusion degrades past ~128
    stacked windows (measured on v5e, tools/probe_rpe_gather.py, n=256
    c=144: 2.20 us/window at 128 windows vs 4.45 at 512; chunking restores
    1.9x bf16 / 2.5x f32 on the attention core).  Exact math — same ops per
    chunk, concatenated.  Kill switch, keyed into jit caches via
    core.factory._dispatch_flags."""
    global _CHUNKED_ATTENTION
    _CHUNKED_ATTENTION = bool(on)


def _attn_chunk_size(b: int, nw: int | None) -> int | None:
    """Chunk size for the window-batch dim: a divisor of ``b`` near 64
    (the measured sweet spot for both dtypes), aligned to the ``nw``-window
    mask structure (chunks must hold whole mask periods or an integer
    divisor of one).  None = do not chunk."""
    if b < 128:
        return None
    best = None
    for cs in range(32, 129):
        if b % cs:
            continue
        if nw is not None and (cs % nw != 0 and nw % cs != 0):
            continue
        if best is None or abs(cs - 64) < abs(best - 64):
            best = cs
    return best


def fused_attention_enabled() -> bool:
    return _FUSED_ATTENTION


def packed_attention_enabled() -> bool:
    return _PACKED_ATTENTION


def use_packed_attention(on: bool) -> None:
    """Route qualifying window-attention blocks through
    ``packed_qkv_attention`` (head padding folded into projection weights).
    Off by default until the microbench (tools/microbench_wattn.py) shows a
    win for the target shape class; keyed into jit caches via
    core.factory._dispatch_flags."""
    global _PACKED_ATTENTION
    _PACKED_ATTENTION = bool(on)


def use_fused_attention(on: bool) -> None:
    """Route multi_head_attention through the fused Pallas window kernel
    (ops/window_attention.py) on shapes where it measured faster than XLA
    (see ops/window_attention.py::supported — DAT-class windows).

    On by default (the dispatch is a no-op on CPU and on shapes where XLA
    wins); pass False as a kill switch. The XLA path remains the reference
    semantics; the kernel differs only by a full-f32 softmax."""
    global _FUSED_ATTENTION
    _FUSED_ATTENTION = bool(on)


def multi_head_attention(q, k, v, num_heads: int, scale: float, bias=None, mask=None):
    """Batched MHA over token sequences.

    q: (B, N, C) already projected; k/v: (B, M, C) (M == N for plain window
    attention; M > N for HAT's overlapping cross-attention); bias:
    (num_heads, N, M) additive; mask: (nW, N, M) additive where B is a
    multiple of nW."""
    b, n, c = q.shape
    if _FUSED_ATTENTION and bias is not None and k.shape[1] == n:
        from ..ops.window_attention import supported, window_mha_pallas

        nw = None if mask is None else mask.shape[0]
        if supported(n, c, num_heads, nw, b):
            mask_j = None if mask is None else jnp.asarray(mask)
            return window_mha_pallas(q, k, v, jnp.asarray(bias, jnp.float32), mask_j,
                                     num_heads=num_heads, scale=float(scale))
    # n >= 128 only: SwinIR-class n=64 windows measured a ~7% LOSS chunked
    # (128^2 b1: 12.8 -> 11.9 MP/s) while every n >= 128 family won
    if _CHUNKED_ATTENTION and n >= 128:
        cs = _attn_chunk_size(b, None if mask is None else mask.shape[0])
        if cs is not None and cs < b:
            nw = None if mask is None else mask.shape[0]
            outs = []
            for i in range(0, b, cs):
                if mask is None:
                    mc = None
                elif cs % nw == 0:
                    mc = mask  # whole mask periods per chunk
                else:
                    mc = mask[i % nw : i % nw + cs]  # nw % cs == 0
                outs.append(_mha_xla(q[i : i + cs], k[i : i + cs], v[i : i + cs],
                                     num_heads, scale, bias, mc))
            return jnp.concatenate(outs, axis=0)
    return _mha_xla(q, k, v, num_heads, scale, bias, mask)


def _mha_xla(q, k, v, num_heads: int, scale: float, bias, mask):
    b, n, c = q.shape
    m = k.shape[1]
    hd = c // num_heads
    q = q.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, m, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, m, num_heads, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum('bhnd,bhmd->bhnm', q * scale, k, preferred_element_type=jnp.float32).astype(q.dtype)
    if bias is not None:
        attn = attn + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b // nw, nw, num_heads, n, m) + mask[None, :, None]
        attn = attn.reshape(b, num_heads, n, m)
    attn = F.softmax(attn, axis=-1)
    out = jnp.einsum('bhnm,bhmd->bhnd', attn, v, preferred_element_type=jnp.float32).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)


def packed_qkv_attention(p, windows, bias, mask, num_heads: int, hd_pad: int = 32,
                         interpret: bool = False):
    """qkv projection + fused window MHA + out projection with every head
    padded to ``hd_pad`` aligned lanes — at ZERO relayout cost.

    The head padding is folded into the qkv projection WEIGHT at trace time
    (zero rows interleaved so head h's output lands at lanes
    [h*hd_pad, h*hd_pad+head_dim)) and the unpad into the out-projection
    weight (zero columns at the pad lanes).  Unlike the measured
    ``head_pad`` path in ops/window_attention.py — which reaches only
    parity with XLA at n=256 because of the extra host-side qkv pass — no
    additional HBM traffic exists here; the only overhead is the qkv
    matmul's wider output (e.g. HAT-S 432 -> 576 lanes).

    ``p``: PTree scoped to the attention module ('qkv.weight' (3C, C),
    optional 'qkv.bias', 'proj.weight' (C, C), optional 'proj.bias');
    ``windows``: (B*nW, N, C); ``bias``: (num_heads, N, N).
    Exactly equivalent to the unpacked path (padded lanes are zeros
    through every matmul).
    """
    from ..ops.window_attention import window_mha_pallas

    b_, n, c = windows.shape
    hd = c // num_heads
    scale = hd**-0.5

    w = p['qkv.weight'].reshape(3, num_heads, hd, c)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, hd_pad - hd), (0, 0)))
    w = w.reshape(3 * num_heads * hd_pad, c)
    bq = p.get('qkv.bias')
    if bq is not None:
        bq = jnp.pad(bq.reshape(3, num_heads, hd), ((0, 0), (0, 0), (0, hd_pad - hd)))
        bq = bq.reshape(3 * num_heads * hd_pad)
    qkv = F.linear(windows, w, bq)
    cpad = num_heads * hd_pad
    q, k, v = qkv[..., :cpad], qkv[..., cpad : 2 * cpad], qkv[..., 2 * cpad :]

    mask_j = None if mask is None else jnp.asarray(mask)
    out = window_mha_pallas(q, k, v, jnp.asarray(bias, jnp.float32), mask_j,
                            num_heads=num_heads, scale=float(scale),
                            head_pad=hd_pad, assume_padded=True, interpret=interpret)

    wp = p['proj.weight'].reshape(c, num_heads, hd)
    wp = jnp.pad(wp, ((0, 0), (0, 0), (0, hd_pad - hd))).reshape(c, cpad)
    return F.linear(out, wp, p.get('proj.bias'))


def swin_window_attention(p, x_windows, num_heads: int, wh: int, ww: int, mask=None, qk_scale=None):
    """WindowAttention with relative position bias (swinir/arch.py:133-173).

    ``p``: PTree scoped to the attention module (qkv/proj/bias table/index);
    ``x_windows``: (B*nW, N, C)."""
    n = x_windows.shape[1]
    c = x_windows.shape[2]
    hd = c // num_heads
    scale = qk_scale if qk_scale is not None else hd**-0.5
    qkv = F.linear(x_windows, p['qkv.weight'], p.get('qkv.bias'))
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]

    table = p['relative_position_bias_table']
    rpi = p['relative_position_index'].reshape(-1)
    bias = table[rpi].reshape(wh * ww, wh * ww, num_heads)
    bias = bias.transpose(2, 0, 1).astype(x_windows.dtype)

    out = multi_head_attention(q, k, v, num_heads, scale, bias=bias, mask=mask)
    return F.linear(out, p['proj.weight'], p.get('proj.bias'))


def rect_attn_mask(h: int, w: int, sp_h: int, sp_w: int, shift_h: int, shift_w: int) -> np.ndarray:
    """Additive shift mask for rectangular windows (DAT-style,
    reference: resselt/archs/dat/arch.py:363-428)."""
    img_mask = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -sp_h), slice(-sp_h, -shift_h), slice(-shift_h, None)):
        for wsl in (slice(0, -sp_w), slice(-sp_w, -shift_w), slice(-shift_w, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    m = img_mask.reshape(h // sp_h, sp_h, w // sp_w, sp_w).transpose(0, 2, 1, 3).reshape(-1, sp_h * sp_w)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)
