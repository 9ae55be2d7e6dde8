#!/usr/bin/env python
"""Re-sweep tile_batch for the 4K overlap-tiled rows (VERDICT-r4 #3).

The serving tile_batch hints were swept at 720p/FHD grids; a 3840x2160
frame has ~4x the tiles per dispatch (e.g. hat t192 h16: 187 windows vs
45), which changes the scan length and peak activation footprint, so the
VMEM-pressure argument behind small transformer batches needs one check
at this scale.  Cells: the hint batch per dtype plus its 2x neighbor
(and 4x for atd bf16, whose FHD optimum moved between rounds).

    python tools/probe_4k_batch.py [--arch hat,dat,atd]

Results -> probe_4k_batch.json (atomic, resumable).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))
OUT = os.path.join(REPO, 'probe_4k_batch.json')

import bench_suite as bs  # noqa: E402

HW = (2160, 3840)
ROW = {'hat': 'hat-s 4x tiled-HD', 'dat': 'dat-s 4x tiled-HD',
       'atd': 'atd-light 4x tiled-FHD'}
# batches to try per (arch, dtype): hint first (same-run baseline)
CELLS = {
    ('hat', 'f32'): (2, 4), ('hat', 'bf16'): (2, 4),
    ('dat', 'f32'): (4, 8), ('dat', 'bf16'): (8, 16),
    ('atd', 'f32'): (1, 2), ('atd', 'bf16'): (2, 4, 8),
}


def _save(done: dict) -> None:
    tmp = OUT + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(done, f, indent=1)
        f.write('\n')
    os.replace(tmp, OUT)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--arch', default='hat,dat,atd')
    args = ap.parse_args(argv)
    archs = [a.strip() for a in args.arch.split(',') if a.strip()]

    bs._enable_cache()
    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.parallel.tiling import _resolve_tile_hint

    done = {}
    if os.path.exists(OUT):
        try:
            done = json.load(open(OUT))
        except Exception:
            done = {}

    cfgs = bs._torch_models(False)
    for arch in archs:
        model = resselt_tpu.load_from_state_dict(
            bs._sd_numpy(cfgs[ROW[arch]]['model']()))
        for dname, dt in (('f32', None), ('bf16', jnp.bfloat16)):
            eff = dt if dt is not None else jnp.float32
            tile = _resolve_tile_hint(model, eff)
            for b in CELLS[(arch, dname)]:
                key = f'{arch} 3840x2160 t{tile} b{b} {dname}'
                if key in done:
                    print(f'{key}: {done[key]} (cached)', flush=True)
                    continue
                try:
                    mps = bs.measure_tpu_tiled(model, HW, tile,
                                               batch_size=b, dtype=dt)
                except Exception as e:
                    done[key] = f'FAIL {type(e).__name__}: {str(e)[:100]}'
                else:
                    done[key] = round(mps, 3)
                _save(done)
                print(f'{key}: {done[key]}', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
