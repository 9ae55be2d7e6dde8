#!/usr/bin/env python
"""Per-checkpoint serving auto-tuner: sweep tile/batch/dtype on the current
device and print the best throughput config for the tiled driver.

    python tools/tune_serving.py CHECKPOINT [--tiles 128,192,256] \
        [--batches 1,2,4,8] [--dtypes f32,bf16] [--budget-s 120]

Serving sweet spots are per-architecture and non-obvious (BENCHMARKS.md:
SwinIR-M peaks at tile 128 batch 1, HAT at 128 b8, ATD at 192 b2, conv
models at 256 b8) — this measures them for ANY checkpoint with the
calibrated on-device loop methodology (CLAUDE.md) and prints the
`upscale_tiled(tile=..., batch_size=...)` / CLI flags to use.

Configs that fail to compile (HBM) are reported and skipped.  The sweep is
time-budgeted: cheapest configs first, stops when the budget is spent.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(model, tile: int, batch: int, dtype, min_seconds: float = 2.0):
    """Output MP/s with the calibrated dependency-chained loop."""
    import functools

    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).random((batch, tile, tile, model.metadata.in_channels),
                                                    dtype=np.float32))
    if dtype is not None:
        x = x.astype(dtype)
    apply_fn = functools.partial(model._apply_fn, model.config)
    out = jax.eval_shape(apply_fn, model.params, x)
    scale = out.shape[1] // tile

    @jax.jit
    def loop(p, x0, n):
        def body(_, carry):
            y = apply_fn(p, carry)
            return carry + jnp.asarray(1e-6, carry.dtype) * y[:, :tile, :tile, : x0.shape[-1]]

        return jnp.sum(jax.lax.fori_loop(0, n, body, x0).astype(jnp.float32))

    float(loop(model.params, x, jnp.int32(2)))  # compile + warm
    t0 = time.perf_counter()
    float(loop(model.params, x, jnp.int32(2)))
    dt1 = time.perf_counter() - t0
    if dt1 >= 4 * min_seconds:
        return (tile * scale) ** 2 * batch * 2 / 1e6 / dt1
    n2 = 2 + max(2, int(2 * min_seconds / max(dt1, 1e-3)) + 1)
    t0 = time.perf_counter()
    float(loop(model.params, x, jnp.int32(n2)))
    dt2 = time.perf_counter() - t0
    per = max(dt2 - dt1, 1e-6) / (n2 - 2)
    return (tile * scale) ** 2 * batch / 1e6 / per


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('checkpoint')
    ap.add_argument('--tiles', default='128,192,256')
    ap.add_argument('--batches', default='1,2,4,8')
    ap.add_argument('--dtypes', default='f32,bf16')
    ap.add_argument('--budget-s', type=float, default=240.0,
                    help='stop sweeping when this much wall-clock is spent')
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax.numpy as jnp

    from resselt_tpu.upscale import load_model

    model = load_model(args.checkpoint)
    log(f'{model.arch_id}: upscale {model.metadata.upscale}, '
        f'arch tile_batch hint {model.tile_batch}')

    tiles = [int(t) for t in args.tiles.split(',')]
    batches = [int(b) for b in args.batches.split(',')]
    dtypes = [( {'f32': None, 'bf16': jnp.bfloat16}[d], d) for d in args.dtypes.split(',')]

    # cheapest first so a tight budget still covers every tile size once
    grid = sorted(((t, b, dt, dn) for t in tiles for b in batches for dt, dn in dtypes),
                  key=lambda c: c[0] * c[0] * c[1])
    results = []
    t_start = time.perf_counter()
    for tile, batch, dt, dname in grid:
        if time.perf_counter() - t_start > args.budget_s and results:
            log(f'budget spent, {len(results)} configs measured')
            break
        try:
            mps = measure(model, tile, batch, dt)
        except Exception as e:
            log(f'tile {tile} b{batch} {dname}: failed ({type(e).__name__}: {str(e)[:80]})')
            continue
        results.append((mps, tile, batch, dname))
        log(f'tile {tile} b{batch} {dname}: {mps:.2f} MP/s')

    if not results:
        log('no config compiled')
        return 1
    results.sort(reverse=True)
    best = results[0]
    print(f'\nbest: tile {best[1]} batch {best[2]} {best[3]}  ({best[0]:.2f} MP/s)')
    print(f"  python: upscale_tiled(model, img, tile={best[1]}, batch_size={best[2]}"
          + (', dtype=jnp.bfloat16)' if best[3] == 'bf16' else ')'))
    print(f'  CLI:    --tile {best[1]}' + (' --bf16' if best[3] == 'bf16' else ''))
    for mps, tile, batch, dname in results[1:4]:
        print(f'  next:   tile {tile} b{batch} {dname}  {mps:.2f} MP/s')
    return 0


if __name__ == '__main__':
    sys.exit(main())
