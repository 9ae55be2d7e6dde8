"""Fused window attention (Pallas/TPU).

Window MHA in the SwinIR lineage (reference swinir/arch.py:75-173, and the
shared-qkv / rectangular variants in atd/arch.py:121-192,
dat/arch.py:146-270) materializes the (B*nW, heads, N, N) score tensor in
HBM three times (logits write, softmax read/write, AV read).  At serving
shapes that traffic dominates: DAT-S at 160^2 tiles moves ~630 MB of
attention matrices per block and its spatial attention alone is ~47% of
the forward (measured, BENCHMARKS.md).  This kernel keeps one window's
scores entirely in VMEM: S = qk^T + bias (+ shift mask), f32 softmax, PV —
one grid step per (batch, window).

Alignment rules honored (hard-won in round 1, see CLAUDE.md):
- all DMA'd block extents keep the last dim a multiple of 128 and the
  second-to-last a multiple of 8: C is lane-padded to 128k by the wrapper,
  N is required to be a multiple of 128 (ws=16 windows and DAT's 8x16
  rectangles qualify; ws=8 / N=64 falls back to the XLA path);
- no dynamic slicing inside the kernel: head slices are static lane
  slices of a VMEM value; bias/mask blocks are selected by the grid
  index_map, never gathered.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, heads: int, hd: int,
            cp: int, scale: float, have_mask: bool):
    q = q_ref[0, 0]  # (n, cp)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    outs = []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q[:, sl].astype(jnp.float32) * scale
        kh = k[:, sl].astype(jnp.float32)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[h].astype(jnp.float32)
        if have_mask:
            s = s + mask_ref[0].astype(jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        vh = v[:, sl].astype(jnp.float32)
        o = jax.lax.dot(p, vh, preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    out = jnp.concatenate(outs, axis=-1)
    if cp > heads * hd:
        out = jnp.pad(out, ((0, 0), (0, cp - heads * hd)))
    o_ref[0, 0] = out


def supported(n: int, c: int, num_heads: int, mask_windows: int | None, batch: int) -> bool:
    """Shapes where this kernel measured FASTER than the UNCHUNKED XLA path.

    SUPERSEDED as the default dispatch by chunked attention
    (nn/window.py::use_chunked_attention): at this gate's one admitted
    regime (n=128, >=1024 windows) chunked XLA measured faster in bf16
    (DAT-S tiled 720p: 4.48 vs 4.13 MP/s) and noise-tied in f32
    (tools/probe_dat_dispatch_tiled.py), so multi_head_attention tries
    chunking first and only falls through here when chunking declines
    (e.g. --no-chunked-attention).  Original gate analysis below.

    Measured per-tile bf16 (v5e, 160²/224² tiles): DAT-S (n=128, hd=30)
    57.6 ms fused vs 68.0 XLA; HAT-S (n=256, hd=24) 70.3 vs 67.0; ATD-light
    (n=256, hd=12) 84.3 vs 81.3.  Every n=256 shape measured was slower
    fused (the per-head lane slicing costs more than the saved score-matrix
    HBM traffic), so the gate admits only the measured-winning class:
    n == 128 windows with head_dim >= 25.

    The win also needs enough stacked windows to amortize per-grid-step
    overhead (round-3 DAT-S 128px bf16: batch*nW=512 loses 6.5 vs 7.4
    MP/s, 1024 wins 8.4 vs 6.7), so small tile batches fall back to XLA;
    the serving path (tile_batch 8 -> 1024 windows at 128px) stays fused."""
    if jax.default_backend() == 'cpu':
        return False
    if n != 128:
        return False
    if c % num_heads != 0 or c // num_heads < 25:
        return False
    if batch < 1024:
        return False
    if mask_windows is not None and batch % mask_windows != 0:
        return False
    return True


@functools.partial(jax.jit, static_argnames=('num_heads', 'scale', 'interpret', 'head_pad',
                                             'assume_padded'))
def window_mha_pallas(q, k, v, bias, mask=None, *, num_heads: int, scale: float,
                      interpret: bool = False, head_pad: int | None = None,
                      assume_padded: bool = False):
    """Fused window MHA.

    q/k/v: (B, N, C) projected per-window tokens (B = batch * nW);
    bias: (num_heads, N, N) additive (relative position bias);
    mask: (nW, N, N) additive shift mask or None.  Returns (B, N, C).

    ``head_pad``: zero-pad every head to this many lanes host-side so the
    kernel's per-head slices land on aligned lane offsets (must divide 128
    and be >= head_dim).  Costs head_pad/head_dim extra qkv traffic.
    Measured (v5e, bf16): at n=256 it recovers the unaligned-slice penalty
    but only reaches parity with XLA (HAT-S 66.9 vs 68.0 ms/tile; ATD
    neutral); at n=128 the host-side re-layout overhead makes it a LOSS
    (DAT-S 67.6 vs 58.3 without).  It therefore stays off in the default
    dispatch — kept as a validated option for future shapes.

    ``assume_padded``: q/k/v already arrive with every head occupying
    ``head_pad`` lanes (zero-filled above the real head_dim) and the output
    is returned in the same padded layout.  This is the zero-cost variant of
    head_pad: the padding is folded into the qkv projection WEIGHTS at trace
    time and the unpad into the out-projection (nn/window.py::
    packed_qkv_attention), so no extra host-side qkv pass exists.  ``scale``
    must already account for the real head_dim.
    """
    b_, n, c = q.shape
    nw = mask.shape[0] if mask is not None else 1
    b = b_ // nw
    if assume_padded:
        if head_pad is None or c != num_heads * head_pad or 128 % head_pad:
            raise ValueError(f'assume_padded: c={c} != heads*head_pad or bad head_pad={head_pad}')
        hd = head_pad
        c_run, hd_run = c, head_pad
    elif head_pad is not None and head_pad != (c // num_heads):
        hd = c // num_heads
        if head_pad < hd or 128 % head_pad:
            raise ValueError(f'head_pad {head_pad} invalid for head_dim {hd}')
        pad_each = ((0, 0), (0, 0), (0, 0), (0, head_pad - hd))
        q, k, v = (
            jnp.pad(t.reshape(b_, n, num_heads, hd), pad_each).reshape(b_, n, num_heads * head_pad)
            for t in (q, k, v)
        )
        c_run = num_heads * head_pad
        hd_run = head_pad
    else:
        hd = c // num_heads
        c_run, hd_run = c, hd
    cp = -(-c_run // 128) * 128
    if cp != c_run:
        pad = ((0, 0), (0, 0), (0, cp - c_run))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    q = q.reshape(b, nw, n, cp)
    k = k.reshape(b, nw, n, cp)
    v = v.reshape(b, nw, n, cp)

    qkv_spec = pl.BlockSpec((1, 1, n, cp), lambda i, j: (i, j, 0, 0))
    bias_spec = pl.BlockSpec((num_heads, n, n), lambda i, j: (0, 0, 0))
    have_mask = mask is not None
    if have_mask:
        mask_spec = pl.BlockSpec((1, n, n), lambda i, j: (j, 0, 0))
        mask_arg = mask
    else:
        # dummy one-window zero mask keeps the kernel signature static
        mask_spec = pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0))
        mask_arg = jnp.zeros((1, 1, 1), q.dtype)

    kernel = functools.partial(_kernel, heads=num_heads, hd=hd_run, cp=cp,
                               scale=scale, have_mask=have_mask)
    out = pl.pallas_call(
        kernel,
        grid=(b, nw),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=pl.BlockSpec((1, 1, n, cp), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nw, n, cp), q.dtype),
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.float32), mask_arg)
    out = out.reshape(b_, n, cp)[:, :, : num_heads * hd_run]
    if hd_run != hd and not assume_padded:
        out = out.reshape(b_, n, num_heads, hd_run)[..., :hd].reshape(b_, n, c)
    return out
