#!/usr/bin/env python
"""ATD tiled-FHD serving: unswept (tile, batch, halo) cells vs current hints.

VERDICT r3 #3's end goal is atd f32 tiled >= 7 MP/s (from 6.24).  The
round-3 tile sweep only measured t128/t192/t256 at halo 16 under the
pre-chunking, pre-halo methodology, and the round-4 halo sweep only swept
halos AT t192.  Unexplored cells with a plausible story:

- t160 h16 -> 192px window = 12 ATD windows (even grid; the t192 f32
  pathology is the 13-wide ODD grid at h8, so even-grid cells are the
  candidates for f32).
- t224 h16 -> 256px window = 16-wide; fewer tiles per frame (45 vs 60)
  at similar recompute ratio.
- t128 b2/b4 -> in the OLD sweep t128 b4 bf16 (6.80) actually beat the
  chosen t192 b2 (6.63); re-measure under the current methodology.

Every verdict is a same-run comparison against the current-hint baseline
cell.  Results land in probe_atd_serving.json (atomic, resumable).  Any
adopted cell whose (tile, halo) pair was never seam-checked must first
pass the sweep_halo-style seam parity gate (--seam runs it).  The gate
runs f32 at batch 1 only: round 4 established seam PSNR is halo- and
batch-independent across the swept grid, and bf16 seam parity is inferred
from f32 (the seam residual is content divergence of windowed attention,
orders above the bf16 rounding floor — advisor r4 note).

    python tools/probe_atd_serving.py [--cells N] [--seam]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))
OUT = os.path.join(REPO, 'probe_atd_serving.json')

import bench_suite as bs  # noqa: E402

HW = (1080, 1920)
# (tile, batch, halo, dtype); baselines first.
CELLS = [
    (192, 1, 16, 'f32'),   # current hint
    (192, 2, 8, 'bf16'),   # current hint
    (160, 1, 16, 'f32'),
    (160, 2, 16, 'f32'),
    (224, 1, 16, 'f32'),
    (128, 2, 16, 'f32'),
    (128, 4, 16, 'f32'),
    (128, 4, 8, 'bf16'),
    (128, 4, 16, 'bf16'),
    (160, 2, 8, 'bf16'),
    (160, 2, 16, 'bf16'),
]


def _save(done: dict) -> None:
    tmp = OUT + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(done, f, indent=1)
        f.write('\n')
    os.replace(tmp, OUT)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--cells', type=int, default=len(CELLS))
    ap.add_argument('--seam', action='store_true',
                    help='run seam-parity PSNR for the non-t192 (tile, halo) pairs')
    args = ap.parse_args(argv)

    bs._enable_cache()
    import jax.numpy as jnp

    import resselt_tpu

    done = {}
    if os.path.exists(OUT):
        try:
            done = json.load(open(OUT))
        except Exception:
            done = {}

    cfgs = bs._torch_models(False)
    c = cfgs['atd-light 4x tiled-FHD']
    model = resselt_tpu.load_from_state_dict(bs._sd_numpy(c['model']()))

    if args.seam:
        # Seam parity at each candidate (tile, halo), sweep_halo's exact gate.
        from sweep_halo import _seam_psnr
        for tile, halo in sorted({(t, h) for t, _, h, _ in CELLS if t != 192}):
            key = f'seam t{tile} h{halo}'
            if key in done:
                print(f'{key}: {done[key]:.2f} dB (cached)', flush=True)
                continue
            # cap the whole-image side: 2.5*224+3 = 563^2 exceeded the
            # tunnel's compile-request body limit (HTTP 413); 2*tile+3
            # still has a real seam grid (2 windows per axis)
            side = 2 * tile + tile // 2 + 3
            if side > 520:
                side = 2 * tile + 3
            db = float(_seam_psnr(model, tile, halo, 1, side=side))
            done[key] = db
            _save(done)
            print(f'{key}: {db:.2f} dB', flush=True)

    for tile, batch, halo, dt in CELLS[: args.cells]:
        key = f'atd 1920x1080 t{tile} b{batch} h{halo} {dt}'
        if key in done:
            print(f'{key}: {done[key]:.2f} MP/s (cached)', flush=True)
            continue
        dtype = jnp.bfloat16 if dt == 'bf16' else jnp.float32
        mps = bs.measure_tpu_tiled(model, HW, tile, batch_size=batch,
                                   dtype=dtype, halo=halo)
        done[key] = mps
        _save(done)
        print(f'{key}: {mps:.2f} MP/s', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
