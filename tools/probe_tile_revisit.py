#!/usr/bin/env python
"""Re-visit serving tiles for the t128 transformers at TUNED halos.

The round-3 tile sweeps (sweep_tiled.json) measured every tile at halo 16
— the pre-round-4 driver default — so t160/t192 cells carried 33-56% halo
recompute that h8 would remove.  Round 5's ATD re-sweep at tuned halos
moved its hint t192 -> t160 (+16% f32 / +13% bf16); this probe asks the
same question for the other tiled families whose hints were pinned at
t128 under the old halo: swinir, dat, drct, rgt, fdat.

Cells: per arch x dtype, the t128 baseline (current hint halo) plus t160
and t192 at their geometry-derived halos (derive_halo: smallest h >= the
swept floor with a window-multiple full window).  720p input, loader
batches.  Every comparison is same-run.

    python tools/probe_tile_revisit.py [--arch swinir,dat,drct,rgt,fdat]

Results -> probe_tile_revisit.json (atomic, resumable).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))
OUT = os.path.join(REPO, 'probe_tile_revisit.json')

import bench_suite as bs  # noqa: E402

HW = (720, 1280)
# r5 second pass: the f32 ranking decreased monotonically over
# (128, 160, 192), so probe BELOW the hint too (96/112; derived halos
# keep the window a multiple — e.g. ws8: 112 and 128 windows)
TILES = (96, 112, 128, 160, 192)
ROW = {'swinir': 'swinir-m 4x tiled-HD', 'dat': 'dat-s 4x tiled-HD',
       'fdat': 'fdat-m 4x tiled-HD'}
FAMILY_ROW = {'drct': 'drct-l 4x', 'rgt': 'rgt 2x'}


def _save(done: dict) -> None:
    tmp = OUT + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(done, f, indent=1)
        f.write('\n')
    os.replace(tmp, OUT)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--arch', default='fdat,swinir,dat,drct,rgt')
    args = ap.parse_args(argv)
    archs = [a.strip() for a in args.arch.split(',') if a.strip()]

    bs._enable_cache()
    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.parallel.tiling import _resolve_halo_hint

    done = {}
    if os.path.exists(OUT):
        try:
            done = json.load(open(OUT))
        except Exception:
            done = {}

    cfgs = bs._torch_models(False)
    for arch in archs:
        if arch in ROW:
            ctor = cfgs[ROW[arch]]['model']
        else:
            import bench_families as bf

            ctor, _, _ = bf._configs()[FAMILY_ROW[arch]]
        model = resselt_tpu.load_from_state_dict(bs._sd_numpy(ctor().eval()))
        for dname, dt in (('f32', None), ('bf16', jnp.bfloat16)):
            eff = dt if dt is not None else jnp.float32
            for tile in TILES:
                halo = _resolve_halo_hint(model, tile, eff)
                key = f'{arch} 1280x720 t{tile} h{halo} {dname}'
                if key in done:
                    print(f'{key}: {done[key]} (cached)', flush=True)
                    continue
                try:
                    mps = bs.measure_tpu_tiled(model, HW, tile, dtype=dt)
                except Exception as e:
                    done[key] = f'FAIL {type(e).__name__}: {str(e)[:100]}'
                else:
                    done[key] = round(mps, 3)
                _save(done)
                print(f'{key}: {done[key]}', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
