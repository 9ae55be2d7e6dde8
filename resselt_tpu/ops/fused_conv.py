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

Measured on the live v5e (256x256x64 -> 64, f32, lrelu, amortizing the
~0.45 ms/iteration loop overhead of this backend — see CLAUDE.md):
``fused_conv3x3_pack2`` 0.275 ms/conv (17.6 useful TFLOPS), XLA's fused
conv+lrelu 0.289, ``fused_conv3x3_act`` 0.312.  The column-pair packed
variant halves the MXU lane-padding waste and edges XLA by ~5%; XLA's
conv is already far better than naive lane padding, so neither kernel is
wired into model forwards — they are validated, opt-in ops.
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


def _kernel(x_hbm, w_ref, b_ref, o_ref, s0, s1, sem0, sem1, *, th: int, act: str, interpret: bool):
    i = pl.program_id(0)
    w_cols = o_ref.shape[1]
    cp = s0.shape[2]
    n_steps = pl.num_programs(0)
    slabs = (s0, s1)
    sems = (sem0, sem1)

    def copy(step, slot: int):
        # one aligned DMA: rows [step*th, step*th + th + 8) of the padded input
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * th, th + _ROW_OVERFETCH)], slabs[slot], sems[slot]
        )

    # double-buffered pipeline: tile i+1's copy overlaps tile i's compute;
    # the buffer slot alternates with grid-step parity (static branches)
    @pl.when(i == 0)
    def _prologue():
        copy(0, 0).start()

    even = i % 2 == 0

    @pl.when(jnp.logical_and(i + 1 < n_steps, even))
    def _prefetch_odd():
        copy(i + 1, 1).start()

    @pl.when(jnp.logical_and(i + 1 < n_steps, jnp.logical_not(even)))
    def _prefetch_even():
        copy(i + 1, 0).start()

    @pl.when(even)
    def _wait_even():
        copy(i, 0).wait()

    @pl.when(jnp.logical_not(even))
    def _wait_odd():
        copy(i, 1).wait()

    cur = jax.lax.cond(even, lambda: s0[:, :, :], lambda: s1[:, :, :])

    acc = jnp.zeros((th * w_cols, o_ref.shape[2]), jnp.float32)
    full = cur
    # roll ONCE per column shift (sublane rolls are the VPU bottleneck, not
    # the MXU dots) and take the three row shifts as free outer-dim slices
    for dj in range(3):
        if dj == 0:
            rolled_full = full
        elif interpret:
            rolled_full = jnp.roll(full, -dj, axis=1)
        else:
            rolled_full = pltpu.roll(full, full.shape[1] - dj, axis=1)
        for di in range(3):
            xs = rolled_full[di : di + th, 0:w_cols, :].reshape(th * w_cols, cp)
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


def _pack2_weights(w_oihw, cin: int, cout: int):
    """Taps for the column-pair packed layout (P=2).

    Lane vector = [col0 channels, col1 channels] (64 each).  For output
    sub-col ``b`` and input sub-col ``a`` of packed shift ``dp``, the
    contributing kernel column is ``dj = 2*dp + a - b - 1`` when in
    [0, 2].  Returns (9, 128, 128): [dr*3+dp, a*64+ci, b*64+co]."""
    half = _LANES // 2
    wk = jnp.zeros((9, _LANES, _LANES), jnp.float32)
    for dr in range(3):
        for dp in range(3):
            for a in range(2):
                for bb in range(2):
                    dj = 2 * dp + a - bb - 1
                    if 0 <= dj <= 2:
                        blk = jnp.transpose(w_oihw[:, :, dr, dj], (1, 0)).astype(jnp.float32)
                        wk = wk.at[
                            dr * 3 + dp,
                            a * half : a * half + cin,
                            bb * half : bb * half + cout,
                        ].set(blk)
    return wk


@functools.partial(jax.jit, static_argnames=('act', 'th', 'interpret'))
def fused_conv3x3_pack2(x, w_oihw, b=None, act: str = 'linear', th: int = 16, interpret: bool = False):
    """Column-pair packed fused 3x3 conv (+bias +activation), for C <= 64.

    Packs two adjacent image columns into the 128 lanes so the MXU runs at
    half the padded work of :func:`fused_conv3x3_act` (which pads C=64 up
    to 128 lanes).  Same kernel body and Mosaic access pattern — only the
    weight layout and the host-side (free) reshapes differ."""
    if th % 8:
        # a non-8-aligned tile height makes the HBM DMA start at row
        # step*th, a non-8-aligned sublane offset — the documented
        # hard-crash class (worker/tunnel outage), see CLAUDE.md bisection
        raise ValueError(f'th must be a multiple of 8, got {th}')
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cin = x.shape
    cout = w_oihw.shape[0]
    if cin > _LANES // 2 or cout > _LANES // 2:
        raise ValueError('pack2 kernel requires cin, cout <= 64')
    if w % 2:
        raise ValueError('pack2 kernel requires even width')
    half = _LANES // 2
    hp = _pad_to(h, th)

    wk = _pack2_weights(w_oihw, cin, cout)
    bp = jnp.zeros((_LANES,), jnp.float32)
    if b is not None:
        bb = b.astype(jnp.float32)
        bp = bp.at[:cout].set(bb).at[half : half + cout].set(bb)

    # packed output cols, padded to x8; input packed cols: 1 halo col on the
    # left (2 absolute cols) + enough slack on the right for dp up to 2
    wp = _pad_to(w // 2, 8)
    wp_in = _pad_to(wp + 2, 8)
    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (1, hp - h + _ROW_OVERFETCH - 1), (2, 2 * wp_in - w - 2), (0, half - cin)),
    )
    # (N, rows, abs cols, 64) -> (N, rows, packed cols, 128): pure reshape
    xp = xp.reshape(n, hp + _ROW_OVERFETCH, wp_in, _LANES)

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
                pltpu.VMEM((th + _ROW_OVERFETCH, wp_in, _LANES), jnp.float32),
                pltpu.VMEM((th + _ROW_OVERFETCH, wp_in, _LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(xi, wk, bp)

    out = jax.vmap(one)(xp)
    # (N, hp, wp, 128) -> unpack column pairs -> crop
    out = out[:, :h, : w // 2, :].reshape(n, h, w, half)[..., :cout]
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=('act', 'th', 'interpret'))
def fused_conv3x3_act(x, w_oihw, b=None, act: str = 'linear', th: int = 16, interpret: bool = False):
    """Fused same-padded 3x3 conv + bias + activation via a Pallas kernel.

    ``x``: (H, W, C) or (N, H, W, C); ``w_oihw``: torch-layout (O, I, 3, 3).
    Channels are internally padded to 128 lanes; output matches
    ``F.conv2d(x, w, b, padding=1)`` + activation in f32."""
    if th % 8:
        # a non-8-aligned tile height makes the HBM DMA start at row
        # step*th, a non-8-aligned sublane offset — the documented
        # hard-crash class (worker/tunnel outage), see CLAUDE.md bisection
        raise ValueError(f'th must be a multiple of 8, got {th}')
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
                pltpu.VMEM((th + _ROW_OVERFETCH, wp_in, cp), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(xi, wk, bp)

    out = jax.vmap(one)(xp)
    out = out[:, :h, :w, :cout]
    return out[0] if squeeze else out


def _lk_kernel(x_hbm, w_ref, b_ref, o_ref, s0, s1, sem0, sem1, *, th: int, k: int,
               hg: int, g_out: int):
    """Large-kernel conv body: k row-shifts x (2*hg+1) group-shifts of MXU
    dots over a column-packed VMEM slab (see fused_conv_lk).

    The ngs group-shifted views of the input arrive as separate HBM planes
    (built host-side by XLA pad/slice/stack) and each is DMA'd into its own
    128-lane strip of the wide slab — every DMA offset/extent is 8-sublane/
    128-lane aligned (the constraint set from the round-2 bisection).  This
    replaces the previous in-kernel pltpu.roll + lane-concat + VMEM staging
    of the wide operand, which was the kernel's measured plateau (VPU-bound
    ~3.6 of 5.7 ms at PLKSR-S shapes); the MXU dot loop reads the slab via
    outer-dim ref slices directly.

    Grid is (batch, row_tiles); batch is folded into the grid because a
    vmap'd pallas_call cannot carry a manually-DMA'd HBM operand (Mosaic
    requires trivial block maps for ANY/HBM-space blocks)."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    halo = k - 1
    rows = th + _pad_to(halo, 8)
    ngs = 2 * hg + 1
    n_steps = pl.num_programs(1)
    n_batch = pl.num_programs(0)
    slabs = (s0, s1)
    sems = (sem0, sem1)

    def copies(batch, step, slot: int):
        return [
            pltpu.make_async_copy(
                x_hbm.at[batch, dg, pl.ds(step * th, rows)],
                slabs[slot].at[:, :, pl.ds(dg * _LANES, _LANES)],
                sems[slot].at[dg],
            )
            for dg in range(ngs)
        ]

    def start(batch, step, slot: int):
        for c in copies(batch, step, slot):
            c.start()

    def wait(batch, step, slot: int):
        for c in copies(batch, step, slot):
            c.wait()

    # linear step index for double-buffer parity and cross-batch prefetch
    lin = bi * n_steps + i
    last = i + 1 == n_steps
    nb = jnp.where(last, bi + 1, bi)
    ni = jnp.where(last, 0, i + 1)
    have_next = jnp.logical_or(jnp.logical_not(last), bi + 1 < n_batch)

    @pl.when(lin == 0)
    def _prologue():
        start(0, 0, 0)

    even = lin % 2 == 0

    @pl.when(jnp.logical_and(have_next, even))
    def _prefetch_odd():
        start(nb, ni, 1)

    @pl.when(jnp.logical_and(have_next, jnp.logical_not(even)))
    def _prefetch_even():
        start(nb, ni, 0)

    @pl.when(even)
    def _wait_even():
        wait(bi, i, 0)

    @pl.when(jnp.logical_not(even))
    def _wait_odd():
        wait(bi, i, 1)

    def compute(slab):
        acc = jnp.zeros((th * g_out, _LANES), jnp.float32)
        for dy in range(k):
            xs = slab[dy : dy + th, 0:g_out, :].reshape(th * g_out, ngs * _LANES)
            acc += jax.lax.dot_general(
                xs.astype(w_ref.dtype), w_ref[dy], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc += b_ref[:]
        o_ref[0] = acc.reshape(th, g_out, _LANES)

    @pl.when(even)
    def _compute_even():
        compute(s0)

    @pl.when(jnp.logical_not(even))
    def _compute_odd():
        compute(s1)


_FUSED_LK = True


def fused_lk_enabled() -> bool:
    return _FUSED_LK


def use_fused_lk(on: bool) -> None:
    """Route PLKSR-style large-kernel partial convs through fused_conv_lk on
    TPU (measured 2x vs XLA at PLKSR-S shapes). Pass False as a kill switch —
    mirrors nn.window.use_fused_attention so a faulty shape on a new backend
    can be disabled without a code change; keyed into jit caches via
    core.factory._dispatch_flags."""
    global _FUSED_LK
    _FUSED_LK = bool(on)


def lk_conv_supported(cin: int, cout: int, k: int) -> bool:
    """Shapes fused_conv_lk supports: packed columns must fill the lanes.
    Pure shape predicate — does not consult the kill switch."""
    return cin in (8, 16, 32, 64) and 0 < cout <= cin and _LANES % cin == 0 and k % 2 == 1


def lk_conv_available(cin: int, cout: int, k: int) -> bool:
    """Dispatch gate: supported shape AND the kill switch is on.  Model
    code should use this; direct fused_conv_lk callers are validated by
    the shape predicate only."""
    return _FUSED_LK and lk_conv_supported(cin, cout, k)


@functools.partial(jax.jit, static_argnames=('k', 'act', 'th', 'interpret', 'compute_dtype'))
def fused_conv_lk(x, w_oihw, b=None, k: int = 17, act: str = 'linear', th: int = 16,
                  interpret: bool = False, compute_dtype: str = 'float32'):
    """Fused same-padded kxk large-kernel conv for few-channel slabs
    (PLKSR's 17x17 partial conv, reference plksr/plksr.py:54-81).

    XLA runs PLKSR-S's 17x17 16->16 conv at 7.7 useful TFLOPS (measured:
    10.0 ms at batch 8, 256^2 — 83% of the whole model's runtime).  This
    kernel packs P = 128/cin image columns into the lanes so every MXU dot
    is a dense (th*G, ngs*128) x (ngs*128, 128) tile: for output
    column-in-group ``a``, packed group shift ``dg`` and input
    column-in-group ``a2``, the contributing kernel column is
    ``dx = P*(dg-hg) + a2 - a + k//2`` (the pack2 algebra generalized).
    Useful:padded FLOP ratio is (k*cin)/(ngs*128) ~= 0.7 at k=17, cin=16 —
    vs ~1/8 lane padding for the naive layout.

    Measured (v5e, 17x17 16->16, 256^2, batch 8, f32): 5.7-5.9 ms vs XLA's
    11.3-11.9 (~2x); whole PLKSR-28 4x model 24.97 -> 34.57 MP/s (+38%).
    compute_dtype='bfloat16' measures the same as f32 (the MXU already runs
    f32 dots as bf16 passes); the plateau past 2x is VPU-bound
    (roll/concat/staging of the packed operand), not MXU or DMA.

    ``x``: (H, W, C) or (N, H, W, C); ``w_oihw``: (O, I, k, k).
    """
    if th % 8:
        # a non-8-aligned tile height makes the HBM DMA start at row
        # step*th, a non-8-aligned sublane offset — the documented
        # hard-crash class (worker/tunnel outage), see CLAUDE.md bisection
        raise ValueError(f'th must be a multiple of 8, got {th}')
    if act not in ('linear', 'lrelu'):
        raise ValueError(f"fused_conv_lk supports act 'linear'/'lrelu', got {act!r}")
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, cin = x.shape
    cout = w_oihw.shape[0]
    if not lk_conv_supported(cin, cout, k):
        raise ValueError(f'unsupported lk conv: cin={cin} cout={cout} k={k}')
    p = _LANES // cin
    pad = k // 2
    hg = -(-pad // p)  # halo groups per side
    ngs = 2 * hg + 1
    # compute_dtype='bfloat16' runs the slab + dots natively in bf16 (f32
    # accumulate): halves DMA/VMEM bytes; sublane tiling widens to 16 so
    # the group dims pad to 16-multiples.  OPT-IN only: the first live-TPU
    # probe of this path coincided with a worker crash/tunnel outage
    # (2026-08-17), so bf16 model inputs take the validated f32-slab path
    # until the bf16 lowering is bisected on hardware.
    cdt = jnp.bfloat16 if compute_dtype == 'bfloat16' else jnp.float32
    sub = 16 if cdt == jnp.bfloat16 else 8

    # weights -> (k*ngs, P*cin, P*cout) via one trace-time-indexed gather
    import numpy as _np

    wt = jnp.transpose(w_oihw, (2, 3, 1, 0)).astype(jnp.float32)  # (k dy, k dx, ci, co)
    wt_pad = jnp.pad(wt, ((0, 0), (0, 1), (0, 0), (0, 0)))  # slot k = zeros
    dgi, a2i, ai = _np.meshgrid(_np.arange(ngs), _np.arange(p), _np.arange(p), indexing='ij')
    dx = p * (dgi - hg) + a2i - ai + pad
    dx = _np.where((dx >= 0) & (dx < k), dx, k)  # out of range -> zero slot
    wk = wt_pad[:, dx]  # (k, ngs, P, P, ci, co)
    wk = wk.transpose(0, 1, 2, 4, 3, 5).reshape(k, ngs, p * cin, p * cout)
    wk = jnp.pad(wk, ((0, 0), (0, 0), (0, 0), (0, _LANES - p * cout)))
    wk = wk.reshape(k, ngs * _LANES, _LANES).astype(cdt)

    bp = jnp.zeros((_LANES,), jnp.float32)
    if b is not None:
        bp = bp.at[: p * cout].set(jnp.tile(b.astype(jnp.float32), p))

    hp = _pad_to(h, th)
    halo_rows = _pad_to(k - 1, 8)
    wp = _pad_to(w, sub * p)  # output cols; groups g_out = wp // p (tile-aligned)
    g_out = wp // p
    g_in = _pad_to(g_out + 2 * hg, sub)
    # rows: pad//2... top halo = pad rows, DMA overfetch slack below.
    # Columns: ngs-1 extra groups on the right so every group-shifted view
    # xp[:, :, dg:dg+g_in] stays in bounds.
    xp = jnp.pad(
        x.astype(cdt),
        ((0, 0), (pad, hp - h + halo_rows - pad),
         (hg * p, (g_in + ngs - 1) * p - w - hg * p), (0, 0)),
    )
    xp = xp.reshape(n, hp + halo_rows, g_in + ngs - 1, _LANES)
    # (n, ngs, rows, g_in, 128): plane dg holds the input shifted left by dg
    # groups, so the kernel's DMA of plane dg into lane strip dg assembles
    # the wide operand with zero in-kernel VPU work
    xp = jnp.stack([xp[:, :, dg : dg + g_in, :] for dg in range(ngs)], axis=1)

    kern = functools.partial(_lk_kernel, th=th, k=k, hg=hg, g_out=g_out)

    def one(xi):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, hp, g_out, _LANES), jnp.float32),
            grid=(n, hp // th),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM if not interpret else pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, th, g_out, _LANES), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((th + halo_rows, g_in, ngs * _LANES), cdt),
                pltpu.VMEM((th + halo_rows, g_in, ngs * _LANES), cdt),
                pltpu.SemaphoreType.DMA((ngs,)),
                pltpu.SemaphoreType.DMA((ngs,)),
            ],
            interpret=interpret,
        )(xi, wk, bp)

    out = one(xp)
    # lanes hold a*cout + co contiguously
    out = out[..., : p * cout].reshape(n, hp, g_out, p, cout)
    out = out.reshape(n, hp, wp, cout)[:, :h, :w, :]
    act_fn = {'linear': lambda t: t, 'lrelu': lambda t: jnp.where(t >= 0, t, 0.2 * t)}[act]
    out = act_fn(out)
    return out[0] if squeeze else out
