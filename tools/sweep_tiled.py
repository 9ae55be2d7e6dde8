#!/usr/bin/env python
"""Sweep tiled-driver serving configs (tile, tile_batch, dtype) for the
three BASELINE tiled rows (HAT-S/DAT-S @720p, ATD-light @FHD).

The tiled rows are the weakest MFU rows in bench_suite.md; their standalone
per-tile rates (e.g. ATD 192^2 b2: 8.0 f32 / 12.5 bf16 MP/s) say the tiled
numbers have headroom beyond halo overhead.  This measures the END-TO-END
driver (exactly tools/bench_suite.py::measure_tpu_tiled, same model
configs) over a (tile, tile_batch, dtype) grid and records every cell in
sweep_tiled.json (resumable — rerun skips measured cells; a tunnel stall
only costs the in-flight cell).

    python tools/sweep_tiled.py [--arch atd,hat,dat] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))
OUT = os.path.join(REPO, 'sweep_tiled.json')

import bench_suite as bs  # noqa: E402  (shared configs + measurement)

ROW = {'hat': 'hat-s 4x tiled-HD', 'dat': 'dat-s 4x tiled-HD', 'atd': 'atd-light 4x tiled-FHD',
       'swinir': 'swinir-m 4x'}
# remaining transformer families: constructors live in bench_families
FAMILY_ROW = {'drct': 'drct-l 4x', 'rgt': 'rgt 2x', 'fdat': 'fdat-m 4x'}
GRID = {
    # (tile, batch) cells per arch; the r2 dead end says HAT tiles>128 were
    # "slightly worse" at the default b8 — re-probe 192 at b2/b4 anyway
    # since tile_batch was never swept jointly with tile.
    'hat': [(128, 2), (128, 4), (128, 8), (128, 16), (192, 2), (192, 4)],
    'dat': [(128, 4), (128, 8), (128, 16), (192, 4), (192, 8)],
    'atd': [(192, 1), (192, 2), (192, 4), (192, 8), (256, 1), (256, 2), (256, 4), (128, 4), (128, 8)],
    # swinir serves tile 128 b1 on the standalone-forward evidence only
    # (probe_swinir_batch: batch scaling negative, and the fori_loop
    # methodology breaks at >=192^2 so larger tiles were never timed);
    # the end-to-end driver sidesteps the loop pathology entirely.
    'swinir': [(128, 1), (128, 2), (160, 1), (160, 2), (192, 1)],
    # chunked attention scales batches better — probe b4 for drct too
    'drct': [(128, 1), (128, 2), (128, 4), (160, 1), (160, 2), (160, 4), (192, 1)],
    'rgt': [(128, 2), (128, 4), (160, 2), (160, 4), (192, 2)],
    'fdat': [(128, 2), (128, 4), (160, 2), (160, 4), (192, 2)],
}
HW = {'swinir': (720, 1280), 'drct': (720, 1280), 'rgt': (720, 1280),
      'fdat': (720, 1280)}  # rows without a tiled_input in bench_suite


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--arch', default='atd,hat,dat')
    ap.add_argument('--quick', action='store_true')
    args = ap.parse_args(argv)

    bs._enable_cache()
    import jax.numpy as jnp

    import resselt_tpu

    done = {}
    if os.path.exists(OUT):
        done = json.load(open(OUT))

    cfgs = bs._torch_models(args.quick)
    for arch in args.arch.split(','):
        if arch in ROW:
            c = cfgs[ROW[arch]]
            ctor = c['model']
            hw = c.get('tiled_input') or HW[arch]
        else:
            import bench_families as bf

            ctor, _, _ = bf._configs()[FAMILY_ROW[arch]]
            hw = HW[arch]
        model = None
        for tile, batch in GRID[arch]:
            for dname, dt in (('f32', None), ('bf16', jnp.bfloat16)):
                key = f'{arch} {hw[1]}x{hw[0]} t{tile} b{batch} {dname}'
                if key in done:
                    continue
                if model is None:
                    model = resselt_tpu.load_from_state_dict(bs._sd_numpy(ctor().eval()))
                try:
                    mps = bs.measure_tpu_tiled(model, hw, tile, batch_size=batch, dtype=dt)
                except Exception as e:
                    done[key] = f'FAIL {type(e).__name__}: {str(e)[:100]}'
                    bs.log(key, '->', done[key])
                else:
                    done[key] = round(mps, 3)
                    bs.log(f'{key}: {mps:.3f} MP/s')
                json.dump(done, open(OUT, 'w'), indent=1)

    for k in sorted(done):
        print(k, done[k])
    return 0


if __name__ == '__main__':
    sys.exit(main())
