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
(tests/test_pallas_ops.py::test_fused_molrcm), and the live chip matches
the XLA chain to 1.3e-3 relative at 256^2.

MEASURED RESULT (2026-08-17, v5e, tools/probe_molrcm.py): the kernel is
1.9x SLOWER than XLA end-to-end (12.6 ms vs 6.7 ms, 256^2 b8 dim64 f32).
The standalone per-op numbers that motivated it (dilated pair 6.58 ms,
region 1.60, 1x1s ~4) do NOT add up in context: XLA fuses the real chain
to 6.7 ms total.  The kernel's costs — 2.5x query / 2.1x region halo
recompute per 16-row tile, 50% lane utilization (128 useful of 256), and
74 pltpu.roll ops per step — exceed the HBM traffic it saves.  Default
OFF; opt-in via use_fused_molrcm(True).  Don't retry without a design
that cuts halo redundancy ~2x (bigger row tiles need >16 MB VMEM) AND
lane waste.
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


def _erf(x):
    # Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7 ~= f32 rounding):
    # Mosaic has no erf lowering, and this keeps interpret == TPU bitpath.
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    return x * 0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))


def _kernel(x_hbm, wv, bv, wq, bq, wr, br, w1, b1, w2, b2, wf, bf, wo, bo,
            o_ref, slab, reg_ref, sem, vsem, *, th: int, p0: int, c1: int, c2: int,
            h: int, w: int, l0: int, tw: int, cg: int, interpret: bool):
    bi = pl.program_id(0)
    k = pl.program_id(1)   # W-tile index: out columns [k*tw, (k+1)*tw)
    i = pl.program_id(2)   # H-tile index
    cp = slab.shape[1]
    wp = slab.shape[2]
    rr = th + 18  # region rows: pair needs region at output rows +-9

    pltpu.make_async_copy(x_hbm.at[bi, k, pl.ds(i * th, th + 2 * p0)], slab, sem).start()
    pltpu.make_async_copy(x_hbm.at[bi, k, pl.ds(i * th, th + 2 * p0)], slab, sem).wait()

    # True-image lane bounds in this tile's coordinates: lane j holds global
    # image column k*tw - l0 + j, valid iff 0 <= global < w.
    lane_lo = l0 - k * tw
    lane_hi = w + l0 - k * tw
    lane_ok = jax.lax.broadcasted_iota(jnp.int32, (cp, wp), 1)
    lane_mask = jnp.logical_and(lane_ok >= lane_lo, lane_ok < lane_hi).astype(jnp.float32)

    def dot(wmat, row):
        return jax.lax.dot_general(wmat, row, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

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
            jax.lax.broadcasted_iota(jnp.int32, (rr, 1, wp), 2) >= lane_lo,
            jax.lax.broadcasted_iota(jnp.int32, (rr, 1, wp), 2) < lane_hi,
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

    # query rows are consumed; refill slab rows [th, 2*th) with fresh x for
    # the value projection (overlaps the pair compute below).  Source start
    # i*th + p0 is 8-row aligned (th, p0 both multiples of 8).
    vcopy = pltpu.make_async_copy(
        x_hbm.at[bi, k, pl.ds(i * th + p0, th)], slab.at[pl.ds(th, th)], vsem)
    vcopy.start()

    # dilated pair on output rows [0, th): slab row p0+t <-> reg index 9+t.
    # Channel-grouped (cg) to bound live rolled temporaries; results land
    # directly in the freed slab rows [0, th) (the fusion input).
    for g0 in range(0, c1, cg):
        g1 = min(g0 + cg, c1)
        r1 = reg_ref[:, g0:g1, :]
        acc = jnp.zeros((th, g1 - g0, wp), jnp.float32) + b1[g0:g1]
        for dxi, dx in enumerate((-4, -2, 0, 2, 4)):
            rolled = _roll_lanes(r1, dx, interpret)
            for dyi, dy in enumerate((-4, -2, 0, 2, 4)):
                acc += rolled[9 + dy : 9 + dy + th] * w1[dyi * 5 + dxi, g0:g1]
        slab[0:th, g0:g1, :] = acc
    slab[0:th, c1 : c1 + c2, :] = reg_ref[9 : 9 + th, c1 : c1 + c2, :]
    for g0 in range(0, cp - c1 - c2, cg):
        g1 = min(g0 + cg, cp - c1 - c2)
        r2 = reg_ref[:, c1 + c2 + g0 : c1 + c2 + g1, :]
        acc = jnp.zeros((th, g1 - g0, wp), jnp.float32) + b2[g0:g1]
        for dxi, dx in enumerate((-9, -6, -3, 0, 3, 6, 9)):
            rolled = _roll_lanes(r2, dx, interpret)
            for dyi, dy in enumerate((-9, -6, -3, 0, 3, 6, 9)):
                acc += rolled[9 + dy : 9 + dy + th] * w2[dyi * 7 + dxi, g0:g1]
        slab[0:th, c1 + c2 + g0 : c1 + c2 + g1, :] = acc

    vcopy.wait()
    for t in range(th):
        f = dot(wf[:], slab[t]) + bf[:]
        f = f * jax.nn.sigmoid(f)
        v = dot(wv[:], slab[th + t]) + bv[:]
        o_ref[0, 0, 0, t] = dot(wo[:], f * v) + bo[:]


_FUSED_MOLRCM = False  # measured 1.9x slower than the XLA chain; opt-in only


def fused_molrcm_enabled() -> bool:
    return _FUSED_MOLRCM


def use_fused_molrcm(on: bool) -> None:
    """Kill switch for the fused MOLRCM kernel (same pattern as
    use_fused_attention / use_fused_lk); keyed into jit caches via
    core.factory._dispatch_flags."""
    global _FUSED_MOLRCM
    _FUSED_MOLRCM = bool(on)


def molrcm_supported(dim: int, h: int, w: int) -> bool:
    """Shape gate: channel split points must be 8-sublane aligned; W is
    tiled into fixed 128-column tiles in-kernel, so scoped VMEM does not
    grow with image size (dim>64 would)."""
    c1, c2 = int(3 / 8 * dim), int(1 / 8 * dim)
    if dim % 8 or c1 % 8 or (c1 + c2) % 8:
        return False
    if dim > 64 or w < 1 or h < 1:
        return False
    return True


def _wb(p, name):
    wt = p[f'{name}.weight']
    b = p.get(f'{name}.bias')
    return wt, b


@functools.partial(jax.jit, static_argnames=('dim', 'th', 'interpret', 'cg'))
def _run(x, wv, bv, wq, bq, wr, br, w1, b1, w2, b2, wf, bf, wo, bo,
         *, dim: int, th: int, interpret: bool, cg: int = 64):
    n, h, w, c = x.shape
    assert c == dim
    c1, c2 = int(3 / 8 * dim), int(1 / 8 * dim)
    p0 = 16
    assert p0 * 2 >= th, 'value rows [th, 2*th) must fit the slab'
    # Both HBM DMAs start at i*th (+p0): non-8-aligned row starts hard-crash
    # the TPU worker (round-2 bisection), so th must stay a multiple of 8.
    assert th % 8 == 0, 'th must be 8-row aligned for the HBM DMAs'
    l0 = 16
    tw = 128            # useful out columns per W-tile
    wp = 2 * _LANES     # fixed lane count: scoped VMEM is W-independent
    nh = -(-h // th)
    nw = -(-w // tw)

    xt = x.astype(jnp.float32).transpose(0, 1, 3, 2)  # (n, h, c, w)
    # Overlapping W-tiles assembled host-side (XLA copy): tile k spans
    # padded columns [k*tw, k*tw + wp) of an image left-padded by l0, i.e.
    # global columns [k*tw - l0, k*tw - l0 + wp).  Keeps every in-kernel
    # DMA full-lane-extent (the round-2 alignment rules).
    xt = jnp.pad(xt, ((0, 0), (p0, nh * th + p0 - h), (0, 0),
                      (l0, (nw - 1) * tw + wp - l0 - w)))
    xt = jnp.stack([xt[..., k * tw : k * tw + wp] for k in range(nw)], axis=1)

    kern = functools.partial(_kernel, th=th, p0=p0, c1=c1, c2=c2, h=h, w=w,
                             l0=l0, tw=tw, cg=cg, interpret=interpret)
    out = pl.pallas_call(
        kern,
        grid=(n, nw, nh),
        out_shape=jax.ShapeDtypeStruct((n, nw, nh, th, dim, wp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(14)
        ],
        out_specs=pl.BlockSpec((1, 1, 1, th, dim, wp),
                               lambda b, k, i: (b, k, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * p0, dim, wp), jnp.float32),   # slab (x -> query -> fuse_in + value x)
            pltpu.VMEM((th + 18, dim, wp), jnp.float32),       # region output
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xt, wv, bv, wq, bq, wr, br, w1, b1, w2, b2, wf, bf, wo, bo)

    # (n, nw, nh, th, dim, wp) -> crop each tile to its tw useful columns,
    # reassemble rows and columns, crop to the true image.
    out = out[..., l0 : l0 + tw].transpose(0, 2, 3, 4, 1, 5)
    out = out.reshape(n, nh * th, dim, nw * tw)[:, :h, :, :w]
    return out.transpose(0, 1, 3, 2).astype(x.dtype)


def fused_molrcm(p, x, dim: int, th: int = 16, interpret: bool = False,
                 cg: int = 64):
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
                dim=dim, th=th, interpret=interpret, cg=cg)
