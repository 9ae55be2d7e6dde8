"""Pallas TPU kernels: fused 3x3 convolution (+bias +activation).

Motivation (measured on v5e, see CLAUDE.md): XLA's conv at SR-typical
channel counts (C=64) is limited by re-reading the activation map from HBM
for every one of the 9 taps; a VMEM-resident kernel reads each tile once.

Mosaic alignment rules the implementation obeys (learned the hard way —
each was isolated with a minimal bisection kernel on the live chip):
* every DMA'd buffer needs a last (lane) dimension that is a multiple of
  128 -> channels are zero-padded to 128;
* a DMA's HBM source slice must start at an 8-aligned sublane offset —
  row-shifted DMAs (``i*TH + 1``) fault the TPU worker at runtime, so the
  kernel issues ONE aligned DMA of ``TH+8`` rows and takes the three
  conv-row shifts as outer-dim ref slices inside VMEM (rows are the
  outermost dim of the (rows, cols, channels) slab, so slicing them is
  unconstrained — only the last two dims are Mosaic-tiled);
* DMA'd extents on the sublane (second-to-last) dim must be multiples of
  8 -> the column dim (W+2) is padded up to a multiple of 8, and the
  output canvas likewise;
* lane shifts use ``pltpu.roll`` (non-negative shifts only).

The kernel computes, per row-tile, ``act(sum_9 shift(x) @ W_k + b)`` with
all 9 taps as MXU matmuls over a VMEM-resident tile.

Measured on the live v5e (256x256x64 -> 64, f32, lrelu): 0.67 ms/conv
(7.2 useful TFLOPS) vs XLA's fused conv+lrelu at 0.74 ms (6.55) — ~10%
faster.  Both are MXU-bound at the lane-PADDED size (64 -> 128 lanes
quadruples the MXU work; the kernel runs that padded work at ~57 TFLOPS,
near the chip's bf16 peak), so the old "XLA re-reads HBM 9x" hypothesis
is dead: there is no large fusion win left at C=64.  See CLAUDE.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROW_OVERFETCH = 8  # halo rows per DMA; 8-multiple keeps the copy aligned


def _act(acc, kind: str):
    if kind == 'linear':
        return acc
    if kind == 'lrelu':
        return jnp.where(acc >= 0, acc, 0.2 * acc)
    if kind == 'silu':
        return acc * jax.nn.sigmoid(acc)
    if kind == 'mish':
        return acc * jnp.tanh(jax.nn.softplus(acc))
    raise ValueError(kind)


def _kernel(x_hbm, w_ref, b_ref, o_ref, s0, sem, *, th: int, act: str, interpret: bool):
    i = pl.program_id(0)
    w_cols = o_ref.shape[1]
    cp = s0.shape[2]

    # one aligned DMA: rows [i*th, i*th + th + 8) of the padded input
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * th, th + _ROW_OVERFETCH)], s0, sem)
    dma.start()
    dma.wait()

    acc = jnp.zeros((th * w_cols, o_ref.shape[2]), jnp.float32)
    for di in range(3):
        # outer-dim slice: conv-row shift inside VMEM (alignment-free)
        slab = s0[di : di + th, :, :]
        for dj in range(3):
            if dj == 0:
                rolled = slab
            elif interpret:
                rolled = jnp.roll(slab, -dj, axis=1)
            else:
                rolled = pltpu.roll(slab, slab.shape[1] - dj, axis=1)
            xs = rolled[:, 0:w_cols, :].reshape(th * w_cols, cp)
            acc += jax.lax.dot_general(
                xs, w_ref[di * 3 + dj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc += b_ref[:]
    acc = _act(acc, act)
    o_ref[:, :, :] = acc.reshape(th, w_cols, o_ref.shape[2])


def _pad_to(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def pallas_conv_available(h: int, w: int, cin: int, cout: int) -> bool:
    """Shapes this kernel supports."""
    return cin <= 2 * _LANES and cout <= _LANES and w >= 128 and h >= 8


@functools.partial(jax.jit, static_argnames=('act', 'th', 'interpret'))
def fused_conv3x3_act(x, w_oihw, b=None, act: str = 'linear', th: int = 16, interpret: bool = False):
    """Fused same-padded 3x3 conv + bias + activation via a Pallas kernel.

    ``x``: (H, W, C) or (N, H, W, C); ``w_oihw``: torch-layout (O, I, 3, 3).
    Channels are internally padded to 128 lanes; output matches
    ``F.conv2d(x, w, b, padding=1)`` + activation in f32."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cin = x.shape
    cout = w_oihw.shape[0]
    hp = _pad_to(h, th)
    cp = _pad_to(cin, _LANES)  # input lane groups (cin <= 256 supported)

    # (9, CP, COP) taps: [di*3+dj, in, out]
    wk = jnp.transpose(w_oihw, (2, 3, 1, 0)).reshape(9, cin, cout)
    wk = jnp.pad(wk, ((0, 0), (0, cp - cin), (0, _LANES - cout))).astype(jnp.float32)
    bp = jnp.zeros((_LANES,), jnp.float32) if b is None else jnp.pad(b.astype(jnp.float32), (0, _LANES - cout))

    # rows: 1 top halo + pad to tile multiple + overfetch slack for the
    # aligned (th+8)-row DMAs -> total hp + 8 rows.
    # cols: 1 left halo + 1 right halo, padded up to a multiple of 8 so the
    # DMA'd sublane extent is aligned.
    wp = _pad_to(w, 8)
    wp_in = _pad_to(wp + 2, 8)
    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (1, hp - h + _ROW_OVERFETCH - 1), (1, wp_in - w - 1), (0, cp - cin)),
    )
    w_cols = wp  # output columns per row (valid cols 0..w-1, rest cropped)

    kern = functools.partial(_kernel, th=th, act=act, interpret=interpret)

    def one(xi):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((hp, wp, _LANES), jnp.float32),
            grid=(hp // th,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM if not interpret else pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((th, wp, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((th + _ROW_OVERFETCH, wp_in, cp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(xi, wk, bp)

    out = jax.vmap(one)(xp)
    out = out[:, :h, :w, :cout]
    return out[0] if squeeze else out
