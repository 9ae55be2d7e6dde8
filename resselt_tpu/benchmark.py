"""Calibrated on-device forward-throughput measurement.

The one honest methodology on this backend (CLAUDE.md): a
dependency-chained on-device ``fori_loop`` with a *dynamic* (traced)
iteration bound — one compile per config — timed twice so the fixed
dispatch+sync latency cancels, and synced through a scalar readback
(``jax.block_until_ready`` does not reliably synchronize through the
remote TPU tunnel).  Shared by ``bench.py``, ``tools/bench_suite.py``,
``tools/bench_families.py`` and ``tools/tune_serving.py`` so the
methodology lives in one place.  (``tools/bench_train.py`` measures a
*train step* — a different loop body — with the same calibration idiom.)
"""

from __future__ import annotations

import functools
import time


# v5e bf16 spec peak for MFU columns; measured attainable on this chip is
# 164.5 TFLOP/s on a 128ch 3x3 conv = 83% of spec (tools/peak_conv.py)
PEAK_TFLOPS = 197.0


def calibrated_per_iter(run, iters: int, min_seconds: float = 2.0,
                        deadline: float | None = None, progress=None) -> float:
    """Genuine seconds/iteration from a latency-cancelling two-run delta.

    ``run(n)`` executes ``n`` dependency-chained iterations on device and
    returns wall seconds INCLUDING the fixed dispatch+readback latency.
    The first (short) run's latency inflates its per-iteration estimate,
    which would UNDERSHOOT the second run's length (a 10 ms/iter config
    behind 0.3 s of latency would get ~0.2 s of genuine work instead of
    ``min_seconds``) — so the second run grows, re-estimating from the
    genuine delta, until it contains at least ``min_seconds`` of real
    device work beyond the first run.

    ``deadline`` (absolute ``time.perf_counter`` value, VERDICT-r4 #1) is a
    hard wall-clock budget: once a next run's *predicted* finish would pass
    it, the best estimate so far is returned instead of issuing the run —
    a tunnel stall degrades the calibration, it no longer hangs the tool.
    ``progress(stage, per_iter_est)`` is called after every completed run
    so callers can emit best-so-far numbers even if later killed.
    """
    note = progress or (lambda stage, est: None)
    dt1 = run(iters)
    note('run1', dt1 / iters)
    if dt1 >= 4 * min_seconds:  # slow config: dispatch latency negligible
        return dt1 / iters
    n2 = iters + max(iters, int(iters * min_seconds / max(dt1, 1e-3)) + 1)
    best = dt1 / iters  # latency-inflated upper bound; refined below
    while True:
        if deadline is not None:
            # predicted wall for the next run from the current estimate,
            # plus the fixed latency already present in dt1
            predicted = best * n2 + 1.0
            if time.perf_counter() + predicted > deadline:
                return best
        dt2 = run(n2)
        genuine = dt2 - dt1
        best = max(genuine, 1e-6) / (n2 - iters)
        note('run2', best)
        if genuine >= min_seconds or n2 - iters >= 1_000_000:
            return best
        n2 = iters + max(2 * (n2 - iters), int(min_seconds / best) + 1)


def measure_forward(model, tile: int, batch: int, dtype=None, iters: int = 3,
                    min_seconds: float = 2.0, halo: int = 0):
    """Measure one model forward; returns ``(useful_mps, sec_per_forward, scale)``.

    With ``halo > 0`` the forward runs at the window size the tiled driver
    actually compiles — ``(tile + 2*halo)``-square inputs — but only the
    ``tile * scale`` core output pixels the driver keeps are credited, so
    the number ranks configs for ``upscale_tiled(tile=..., halo=...)``
    honestly (per-tile rates at the bare tile size do not: the halo is
    ~27% extra area at tile 128).  ``halo=0`` measures the bare forward.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    win = tile + 2 * halo
    in_ch = model.metadata.in_channels
    x = jnp.asarray(np.random.default_rng(0).random((batch, win, win, in_ch), dtype=np.float32))
    if dtype is not None:
        x = x.astype(dtype)
    apply_fn = functools.partial(model._apply_fn, model.config)
    out_shape = jax.eval_shape(apply_fn, model.params, x)
    scale = out_shape.shape[1] // win

    @jax.jit
    def loop(p, x0, n):
        def body(_, carry):
            y = apply_fn(p, carry)
            return carry + jnp.asarray(1e-6, carry.dtype) * y[:, :win, :win, :in_ch]

        return jnp.sum(jax.lax.fori_loop(0, n, body, x0).astype(jnp.float32))

    float(loop(model.params, x, jnp.int32(iters)))  # compile + warm

    def run(n):
        t0 = time.perf_counter()
        float(loop(model.params, x, jnp.int32(n)))
        return time.perf_counter() - t0

    per_iter = calibrated_per_iter(run, iters, min_seconds)
    mps = (tile * scale) ** 2 * batch / 1e6 / per_iter
    return mps, per_iter, scale


def measure_tiled(model, hw, tile: int | None = None, halo: int | None = None,
                  batch_size: int | None = None, dtype=None, iters: int = 2,
                  min_seconds: float = 2.0):
    """End-to-end tiled-driver throughput, on-device-looped and calibrated.

    Wraps the SAME single-dispatch program ``upscale_tiled`` serves
    (``parallel.tiling.tiled_program``: extract -> scan over tile batches ->
    stitch, per-arch batch resolution included) in a dependency-chained
    ``fori_loop``, so the per-dispatch tunnel latency (~110 ms) and sync
    jitter that made short single-dispatch timings noisy (CLAUDE.md: the
    rgt cells) cancel out of the number.  Returns ``(mps, sec_per_frame)``.

    Caveat (CLAUDE.md round 1): the fori_loop methodology can break on very
    large transformer bodies (buffer-assignment pathology) — cross-check a
    new config against a direct-dispatch timing once before trusting it
    (tools/probe_tiled_loop.py did this for the seven tiled families).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .parallel.tiling import tiled_program

    h, w = hw
    fn, scale = tiled_program(model, h, w, tile=tile, halo=halo,
                              batch_size=batch_size, dtype=dtype)
    if fn is None:
        raise ValueError(f'({h}, {w}) fits in one tile window; use measure_forward')
    in_ch = model.metadata.in_channels
    img = jnp.asarray(np.random.default_rng(0).random((h, w, in_ch), dtype=np.float32))
    if dtype is not None:
        img = img.astype(dtype)

    @jax.jit
    def loop(p, x0, n):
        def body(_, carry):
            y = fn(p, carry)
            return carry + jnp.asarray(1e-6, carry.dtype) * y[:h, :w, :in_ch].astype(carry.dtype)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x0).astype(jnp.float32))

    float(loop(model.params, img, jnp.int32(1)))  # compile + warm

    def run(n):
        t0 = time.perf_counter()
        float(loop(model.params, img, jnp.int32(n)))
        return time.perf_counter() - t0

    per_frame = calibrated_per_iter(run, iters, min_seconds)
    mps = h * w * scale * scale / 1e6 / per_frame
    return mps, per_frame


def measure_tiled_direct(model, hw, tile: int | None = None,
                         halo: int | None = None,
                         batch_size: int | None = None, dtype=None,
                         iters: int = 2, min_seconds: float = 2.0):
    """``measure_tiled`` without the outer on-device fori_loop.

    The looped methodology CRASHES the TPU worker on very large tile grids
    (hat-s at 4K: ~220 windows of 224^2 through a 36-block body — the
    round-1 "large transformer in a fori_loop" pathology at driver scale;
    reproduced twice in r5).  Here each frame is a separate dispatch with
    a scalar readback; per-frame time is seconds at 4K, so the ~30 ms
    tunnel round-trip per iteration is <2% and the two-run delta still
    cancels the fixed setup.  Returns ``(mps, sec_per_frame)``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .parallel.tiling import tiled_program

    h, w = hw
    fn, scale = tiled_program(model, h, w, tile=tile, halo=halo,
                              batch_size=batch_size, dtype=dtype)
    if fn is None:
        raise ValueError(f'({h}, {w}) fits in one tile window; use measure_forward')
    in_ch = model.metadata.in_channels
    img = jnp.asarray(np.random.default_rng(0).random((h, w, in_ch), dtype=np.float32))
    if dtype is not None:
        img = img.astype(dtype)
    img = jax.device_put(img)  # upload outside the timed region

    reduce_fn = jax.jit(lambda y: jnp.sum(y[:: max(1, (h * scale) // 64)].astype(jnp.float32)))

    def one_frame():
        return float(reduce_fn(fn(model.params, img)))

    one_frame()  # compile + warm

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            one_frame()  # per-frame readback: honest, <2% at 4K scales
        return time.perf_counter() - t0

    per_frame = calibrated_per_iter(run, iters, min_seconds)
    mps = h * w * scale * scale / 1e6 / per_frame
    return mps, per_frame
