#!/usr/bin/env python
"""Per-checkpoint serving auto-tuner: sweep tile/batch/dtype on the current
device and print the best throughput config for the tiled driver.

    python tools/tune_serving.py CHECKPOINT [--tiles 128,192,256] \
        [--batches 1,2,4,8] [--dtypes f32,bf16] [--halo 16] [--budget-s 240]

Serving sweet spots are per-architecture and non-obvious (BENCHMARKS.md /
sweep_tiled.json: SwinIR-M peaks at tile 128 batch 1, HAT at 192 b2, ATD at
192 b2, conv models at 256 b8) — this measures them for ANY checkpoint with
the calibrated on-device loop methodology (resselt_tpu.benchmark) and
prints the `upscale_tiled(tile=..., batch_size=...)` / CLI flags to use.

Each config is measured at the window size the tiled driver actually
compiles — (tile + 2*halo)-square inputs, crediting only the core output
pixels — because bare per-tile rates mis-rank configs (the halo is ~27%
extra area at tile 128, and VMEM behavior can flip between the shapes;
sweep_tiled.py's end-to-end runs are the ground truth this approximates
without paying full-image extract/stitch per config).

Configs that fail to compile (HBM) are reported and skipped.  The sweep is
time-budgeted: cheapest configs first, stops when the budget is spent.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('checkpoint')
    ap.add_argument('--tiles', default='128,192,256')
    ap.add_argument('--batches', default='1,2,4,8')
    ap.add_argument('--dtypes', default='f32,bf16')
    ap.add_argument('--halo', type=int, default=16,
                    help='halo the tiled driver will run with (windows are tile+2*halo)')
    ap.add_argument('--budget-s', type=float, default=240.0,
                    help='stop sweeping when this much wall-clock is spent')
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax.numpy as jnp

    from resselt_tpu.benchmark import measure_forward
    from resselt_tpu.upscale import load_model

    model = load_model(args.checkpoint)
    log(f'{model.arch_id}: upscale {model.metadata.upscale}, '
        f'arch tile_batch hint {model.tile_batch}')

    tiles = [int(t) for t in args.tiles.split(',')]
    batches = [int(b) for b in args.batches.split(',')]
    dtypes = [({'f32': None, 'bf16': jnp.bfloat16}[d], d) for d in args.dtypes.split(',')]

    # cheapest first (by compiled window area) so a tight budget still
    # covers every tile size once
    win = lambda t: t + 2 * args.halo  # noqa: E731
    grid = sorted(((t, b, dt, dn) for t in tiles for b in batches for dt, dn in dtypes),
                  key=lambda c: win(c[0]) ** 2 * c[1])
    results = []
    t_start = time.perf_counter()
    for tile, batch, dt, dname in grid:
        if time.perf_counter() - t_start > args.budget_s and results:
            log(f'budget spent, {len(results)} configs measured')
            break
        try:
            mps, _, _ = measure_forward(model, tile, batch, dt, halo=args.halo)
        except Exception as e:
            log(f'tile {tile} b{batch} {dname}: failed ({type(e).__name__}: {str(e)[:80]})')
            continue
        results.append((mps, tile, batch, dname))
        log(f'tile {tile} b{batch} {dname}: {mps:.2f} MP/s (core pixels, window {win(tile)})')

    if not results:
        log('no config compiled')
        return 1
    results.sort(reverse=True)
    best = results[0]
    print(f'\nbest: tile {best[1]} batch {best[2]} {best[3]}  ({best[0]:.2f} MP/s)')
    print(f"  python: upscale_tiled(model, img, tile={best[1]}, halo={args.halo}, "
          f"batch_size={best[2]}" + (', dtype=jnp.bfloat16)' if best[3] == 'bf16' else ')'))
    print(f'  CLI:    --tile {best[1]} --halo {args.halo}'
          + (' --bf16' if best[3] == 'bf16' else ''))
    for mps, tile, batch, dname in results[1:4]:
        print(f'  next:   tile {tile} b{batch} {dname}  {mps:.2f} MP/s')
    return 0


if __name__ == '__main__':
    sys.exit(main())
