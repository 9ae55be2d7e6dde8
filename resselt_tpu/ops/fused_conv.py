"""Pallas TPU kernels: fused 3x3 convolution (+bias +activation).

Motivation (measured on v5e, see CLAUDE.md): XLA's conv at SR-typical
channel counts (C=64) is limited by re-reading the activation map from HBM
for every one of the 9 taps; a VMEM-resident kernel reads each tile once.

Mosaic alignment rules the implementation obeys (learned the hard way):
* every DMA'd buffer needs a last (lane) dimension that is a multiple of
  128 -> channels are zero-padded to 128;
* sublane (second-to-last) slicing must be 8-aligned -> the three row
  shifts use three separate row-shifted DMAs instead of in-kernel slices;
* lane shifts use ``pltpu.roll`` (non-negative shifts only).

The kernel computes, per row-tile, ``act(sum_9 shift(x) @ W_k + b)`` with
all 9 taps as MXU matmuls over a VMEM-resident tile.

STATUS (round 1): exact in interpret mode (tests/test_pallas_ops.py), but
every live-TPU run through the axon tunnel faults the worker process
(three attempts: unaligned sublane ref slices; row-shifted DMAs with
``pl.ANY`` input; input pinned to ``pltpu.HBM``).  Until the round-2
bisection (CLAUDE.md) isolates the faulting construct, do not call with
``interpret=False`` on the shared tunnel TPU — a fault costs ~15 min of
worker downtime.  Nothing in the library calls this on the live path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


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


def _kernel(x_hbm, w_ref, b_ref, o_ref, s0, s1, s2, sems, *, th: int, act: str, interpret: bool):
    i = pl.program_id(0)
    w_cols = o_ref.shape[1]
    cp = s0.shape[2]

    slabs = (s0, s1, s2)
    copies = []
    for di in range(3):
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * th + di, th)], slabs[di], sems.at[di])
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()

    acc = jnp.zeros((th * w_cols, o_ref.shape[2]), jnp.float32)
    for di in range(3):
        slab = slabs[di][:, :, :]
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
    return cin <= _LANES and cout <= _LANES and w >= 128 and h >= 8


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

    # (9, CP, CP) taps: [di*3+dj, in, out]
    wk = jnp.transpose(w_oihw, (2, 3, 1, 0)).reshape(9, cin, cout)
    wk = jnp.pad(wk, ((0, 0), (0, _LANES - cin), (0, _LANES - cout))).astype(jnp.float32)
    bp = jnp.zeros((_LANES,), jnp.float32) if b is None else jnp.pad(b.astype(jnp.float32), (0, _LANES - cout))

    # rows: 1 top halo + (pad to tile multiple) + 1 bottom halo + 2 slack for the shifted DMAs
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, hp - h + 3), (1, 1), (0, _LANES - cin)))
    w_cols = w  # valid output columns per row

    kern = functools.partial(_kernel, th=th, act=act, interpret=interpret)

    def one(xi):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((hp, w, _LANES), jnp.float32),
            grid=(hp // th,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM if not interpret else pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((th, w, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((th, w + 2, _LANES), jnp.float32),
                pltpu.VMEM((th, w + 2, _LANES), jnp.float32),
                pltpu.VMEM((th, w + 2, _LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            interpret=interpret,
        )(xi, wk, bp)

    out = jax.vmap(one)(xp)
    out = out[:, :h, :, :cout]
    return out[0] if squeeze else out
