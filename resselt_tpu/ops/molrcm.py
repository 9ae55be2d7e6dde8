"""Pallas TPU kernel: fused EIMN MOLRCM block (eimn/arch.py:103-147).

Round-2/3 profiling (tools/profile_eimn.py, 256^2 b8 f32) showed the MOLRCM
chain dominates the EIMN block (~9-13 of 16.4 ms): XLA runs the dilated
depthwise pair (5x5 d2 + 7x7 d3) at 0.35 TFLOP/s in every formulation
(dilated conv, exact space-to-batch rewrite, shifted-FMA), and each 1x1
conv re-reads the 64 MB activation set from HBM.  This kernel computes the
ENTIRE MOLRCM attention per row-tile out of VMEM:

    value = W_v x ; q = gelu(W_q x) ; q = dw5x5(q)            (region)
    q1 = dw5x5_d2(q[:c1]) ; q2 = q[c1:c1+c2] ; q3 = dw7x7_d3(q[c1+c2:])
    out = W_o (silu(W_f [q1 q2 q3]) * value)

Layout: ``(n, rows=H, C, W)`` — W on lanes (static lane rolls give the
conv column shifts), C on sublanes (depthwise branches address their exact
channel slices, no lane-padding waste), H on the outer dim (row shifts are
free ref slices; the per-tile DMA stays 8-sublane/128-lane aligned per the
round-2 bisection rules in ops/fused_conv.py).  The 1x1 convs are MXU
dots contracting over the sublane (C) dim, one per row.  Zero-masking of
query/region outside the true image reproduces torch's zero conv padding
exactly (the reference pads each conv's input with zeros; a fused chain
must re-zero the halo between stages).

Exactness: interpret mode matches the jnp reference path to f32 rounding
(tests/test_pallas_ops.py::test_fused_molrcm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _pad_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _roll_lanes(x, dx: int, interpret: bool):
    """rolled[..., w] = x[..., w + dx] (static shift, lane dim)."""
    if dx == 0:
        return x
    if interpret:
        return jnp.roll(x, -dx, axis=-1)
    return pltpu.roll(x, (-dx) % x.shape[-1], axis=x.ndim - 1)


def _gelu(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))


def _kernel(x_hbm, wv, bv, wq, bq, wr, br, w1, b1, w2, b2, wf, bf, wo, bo,
            o_ref, slab, value_ref, reg_ref, sem, *, th: int, p0: int, c1: int, c2: int,
            h: int, w: int, l0: int, cg: int, interpret: bool):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    cp = slab.shape[1]
    wp = slab.shape[2]
    rr = th + 18  # region rows: pair needs region at output rows +-9

    pltpu.make_async_copy(x_hbm.at[bi, pl.ds(i * th, th + 2 * p0)], slab, sem).start()
    pltpu.make_async_copy(x_hbm.at[bi, pl.ds(i * th, th + 2 * p0)], slab, sem).wait()

    lane_ok = jax.lax.broadcasted_iota(jnp.int32, (cp, wp), 1)
    lane_mask = jnp.logical_and(lane_ok >= l0, lane_ok < l0 + w).astype(jnp.float32)

    def dot(wmat, row):
        return jax.lax.dot_general(wmat, row, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # value rows [p0, p0+th) — read BEFORE query overwrites the slab
    for t in range(th):
        value_ref[t] = dot(wv[:], slab[p0 + t]) + bv[:]

    # query in-place: rows [4, th+28) in slab coords (region halo 2 beyond
    # the pair's +-9 halo); masked to zero outside the true image so the
    # region taps see torch's zero padding
    for s in range(p0 - 12, th + p0 + 12):
        row_abs = i * th + s - p0
        q = _gelu(dot(wq[:], slab[s]) + bq[:]) * lane_mask
        slab[s] = jnp.where(jnp.logical_and(row_abs >= 0, row_abs < h), q, 0.0)

    # region 5x5 dw on rows [p0-9, p0+th+9) -> reg_ref, channel-grouped to
    # bound live VMEM values (rolled slab copies)
    row3 = jax.lax.broadcasted_iota(jnp.int32, (rr, 1, wp), 0) + (i * th - 9)
    mask3 = jnp.logical_and(row3 >= 0, row3 < h).astype(jnp.float32) * \
        jnp.logical_and(
            jax.lax.broadcasted_iota(jnp.int32, (rr, 1, wp), 2) >= l0,
            jax.lax.broadcasted_iota(jnp.int32, (rr, 1, wp), 2) < l0 + w,
        ).astype(jnp.float32)
    for g0 in range(0, cp, cg):
        g1 = min(g0 + cg, cp)
        qg = slab[p0 - 12 : th + p0 + 12, g0:g1, :]
        acc = jnp.zeros((rr, g1 - g0, wp), jnp.float32) + br[g0:g1]
        for dxi, dx in enumerate((-2, -1, 0, 1, 2)):
            rolled = _roll_lanes(qg, dx, interpret)
            for dyi, dy in enumerate((-2, -1, 0, 1, 2)):
                # region row (slab s = p0-9+ri) needs q row s+dy -> qg index 3+dy+ri
                acc += rolled[3 + dy : 3 + dy + rr] * wr[dyi * 5 + dxi, g0:g1]
        reg_ref[:, g0:g1, :] = acc * mask3

    # dilated pair on output rows [0, th): slab row p0+t <-> reg index 9+t
    acc1 = jnp.zeros((th, c1, wp), jnp.float32) + b1[:]
    r1 = reg_ref[:, 0:c1, :]
    for dxi, dx in enumerate((-4, -2, 0, 2, 4)):
        rolled = _roll_lanes(r1, dx, interpret)
        for dyi, dy in enumerate((-4, -2, 0, 2, 4)):
            acc1 += rolled[9 + dy : 9 + dy + th] * w1[dyi * 5 + dxi]
    acc3 = jnp.zeros((th, cp - c1 - c2, wp), jnp.float32) + b2[:]
    r2 = reg_ref[:, c1 + c2 : cp, :]
    for dxi, dx in enumerate((-9, -6, -3, 0, 3, 6, 9)):
        rolled = _roll_lanes(r2, dx, interpret)
        for dyi, dy in enumerate((-9, -6, -3, 0, 3, 6, 9)):
            acc3 += rolled[9 + dy : 9 + dy + th] * w2[dyi * 7 + dxi]

    # fusion input assembled into freed slab rows [0, th)
    slab[0:th, 0:c1, :] = acc1
    slab[0:th, c1 : c1 + c2, :] = reg_ref[9 : 9 + th, c1 : c1 + c2, :]
    slab[0:th, c1 + c2 : cp, :] = acc3

    for t in range(th):
        f = dot(wf[:], slab[t]) + bf[:]
        f = f * jax.nn.sigmoid(f)
        o_ref[0, 0, t] = dot(wo[:], f * value_ref[t]) + bo[:]


_FUSED_MOLRCM = True


def fused_molrcm_enabled() -> bool:
    return _FUSED_MOLRCM


def use_fused_molrcm(on: bool) -> None:
    """Kill switch for the fused MOLRCM kernel (same pattern as
    use_fused_attention / use_fused_lk); keyed into jit caches via
    core.factory._dispatch_flags."""
    global _FUSED_MOLRCM
    _FUSED_MOLRCM = bool(on)


def molrcm_supported(dim: int, h: int, w: int) -> bool:
    """Shape gate: channel split points must be 8-sublane aligned and the
    row slab must fit VMEM (w bounds the lane count)."""
    c1, c2 = int(3 / 8 * dim), int(1 / 8 * dim)
    if dim % 8 or c1 % 8 or (c1 + c2) % 8:
        return False
    if dim > 64 or w > 768 or h < 1:
        return False
    return True


def _wb(p, name):
    wt = p[f'{name}.weight']
    b = p.get(f'{name}.bias')
    return wt, b


@functools.partial(jax.jit, static_argnames=('dim', 'th', 'interpret'))
def _run(x, wv, bv, wq, bq, wr, br, w1, b1, w2, b2, wf, bf, wo, bo,
         *, dim: int, th: int, interpret: bool):
    n, h, w, c = x.shape
    assert c == dim
    c1, c2 = int(3 / 8 * dim), int(1 / 8 * dim)
    p0 = 16
    l0 = 16
    wp = _pad_to(l0 + w + 16, _LANES)
    nh = -(-h // th)

    xt = x.astype(jnp.float32).transpose(0, 1, 3, 2)  # (n, h, c, w)
    xt = jnp.pad(xt, ((0, 0), (p0, nh * th + p0 - h), (0, 0), (l0, wp - w - l0)))

    kern = functools.partial(_kernel, th=th, p0=p0, c1=c1, c2=c2, h=h, w=w,
                             l0=l0, cg=32, interpret=interpret)
    out = pl.pallas_call(
        kern,
        grid=(n, nh),
        out_shape=jax.ShapeDtypeStruct((n, nh, th, dim, wp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(14)
        ],
        out_specs=pl.BlockSpec((1, 1, th, dim, wp), lambda b, i: (b, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * p0, dim, wp), jnp.float32),   # slab (x -> query -> fuse_in)
            pltpu.VMEM((th, dim, wp), jnp.float32),            # value
            pltpu.VMEM((th + 18, dim, wp), jnp.float32),       # region output
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt, wv, bv, wq, bq, wr, br, w1, b1, w2, b2, wf, bf, wo, bo)

    out = out.reshape(n, nh * th, dim, wp)[:, :h, :, l0 : l0 + w]
    return out.transpose(0, 1, 3, 2).astype(x.dtype)


def fused_molrcm(p, x, dim: int, th: int = 16, interpret: bool = False):
    """Drop-in for archs/eimn.py::_molrcm.  ``p`` is the PTree scoped to the
    attention module; ``x`` is the NHWC input after norm1."""
    c1, c2 = int(3 / 8 * dim), int(1 / 8 * dim)

    def mat(name):
        wt, b = _wb(p, name)
        wm = jnp.asarray(wt, jnp.float32).reshape(wt.shape[0], wt.shape[1])
        bm = jnp.zeros((wt.shape[0], 1), jnp.float32) if b is None else jnp.asarray(b, jnp.float32)[:, None]
        return wm, bm

    def taps(name, k):
        wt, b = _wb(p, name)  # (c, 1, k, k)
        c = wt.shape[0]
        wk = jnp.asarray(wt, jnp.float32).reshape(c, k * k).T[:, :, None]  # (k*k, c, 1)
        bk = jnp.zeros((c, 1), jnp.float32) if b is None else jnp.asarray(b, jnp.float32)[:, None]
        return wk, bk

    wv, bv = mat('proj_value.0')
    wq, bq = mat('proj_query.0')
    wr, br = taps('region', 5)
    w1, b1 = taps('spatial_1', 5)
    w2, b2 = taps('spatial_2', 7)
    wf, bf = mat('fusion')
    wo, bo = mat('out')
    return _run(x, wv, bv, wq, bq, wr, br, w1, b1, w2, b2, wf, bf, wo, bo,
                dim=dim, th=th, interpret=interpret)
