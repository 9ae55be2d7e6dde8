#!/usr/bin/env python
"""Explain the hat halo/seam anomaly; decide the f32 (and bf16) halo hint.

VERDICT-r4 #5.  sweep_halo.json facts at t192 (hat-s, window_size 16):

  halo  window  padded-to  seam dB  f32 MP/s  bf16 MP/s
   4     200      208       62.87    3.345     5.805
   8     208      208       49.95    3.326     5.808
   12    216      224       68.46    3.865     (unmeasured)
   16    224      224       49.95    3.863     6.511
   24    240      240       49.95    2.599     5.276

Two patterns fall out of the table alone:
  (a) throughput collapses by PADDED window (h4==h8, h12==h16): HAT
      reflect-pads non-multiple windows up to the next 16 internally, so
      the compute is identical — the non-multiple halo is FREE.
  (b) the non-multiple halos seam 13-18 dB BETTER than their padded
      twins, even though they keep LESS real context.

Hypothesis for (b): with window 216, every tile carries 8 rows/cols of
internal reflect pad at its bottom/right; the model's own border handling
(attention-mask truncation at the window edge) then lands INSIDE the pad,
8 px beyond the nominal halo, so the border-affected band is pushed out of
the stitched core on the bottom/right seam sides.  This probe tests that
directly by measuring WHERE the tiled-vs-whole error lives:

  1. per-row / per-column mean |tiled - whole| profiles at h8/h12/h16;
  2. band decomposition per seam: error in the +/-(2*ws) px band on the
     contributed-by-upper/left tile side vs the lower/right tile side.

If the hypothesis holds, h12's error drops specifically on the sides fed
by a padded tile edge, and h12 takes the f32 hint (same speed as h16,
18 dB cleaner seams); the missing h12 bf16 cell decides the bf16 hint.

    python tools/probe_hat_seam.py [--skip-bench]

Results -> probe_hat_seam.json (atomic, resumable).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))
OUT = os.path.join(REPO, 'probe_hat_seam.json')

import bench_suite as bs  # noqa: E402

TILE = 192
HALOS = (8, 12, 16)


def _save(done: dict) -> None:
    tmp = OUT + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(done, f, indent=1)
        f.write('\n')
    os.replace(tmp, OUT)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--skip-bench', action='store_true',
                    help='skip the h12 bf16 throughput cell')
    args = ap.parse_args(argv)

    bs._enable_cache()
    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.parallel import upscale_tiled

    done = {}
    if os.path.exists(OUT):
        try:
            done = json.load(open(OUT))
        except Exception:
            done = {}

    cfgs = bs._torch_models(False)
    c = cfgs['hat-s 4x tiled-HD']
    model = resselt_tpu.load_from_state_dict(bs._sd_numpy(c['model']()))
    scale = model.metadata.upscale

    # sweep_halo's exact seam geometry: 483^2, seeds match
    side = 2 * TILE + TILE // 2 + 3
    img = np.random.default_rng(7).random((side, side, 3), dtype=np.float32)

    if not all(f'h{h} seam_db' in done for h in HALOS):
        whole = np.asarray(model(img), dtype=np.float32)
        for h in HALOS:
            if f'h{h} seam_db' in done:
                continue
            tiled = np.asarray(upscale_tiled(model, img, tile=TILE, halo=h,
                                             batch_size=2), dtype=np.float32)
            e = np.abs(tiled - whole).mean(axis=-1)  # (H*s, W*s)
            mse = float(np.mean((tiled - whole) ** 2))
            done[f'h{h} seam_db'] = round(10 * np.log10(1 / max(mse, 1e-12)), 2)

            # seam positions in OUTPUT pixels: tile-core boundaries
            seams = [TILE * scale]  # 483 -> cores at y=0..192, 192..384, 384..483
            prof_r = e.mean(axis=1)
            prof_c = e.mean(axis=0)
            # row/col profile summary: top-8 error rows/cols and their values
            top_r = np.argsort(prof_r)[-8:][::-1]
            top_c = np.argsort(prof_c)[-8:][::-1]
            done[f'h{h} top_rows'] = [[int(i), float(f'{prof_r[i]:.2e}')] for i in top_r]
            done[f'h{h} top_cols'] = [[int(i), float(f'{prof_c[i]:.2e}')] for i in top_c]
            # band decomposition around each seam: ABOVE the seam is fed by
            # the upper tile's BOTTOM edge (internally padded when the
            # window is a non-multiple); BELOW by the lower tile's top edge
            band = 2 * 16 * scale
            for s in seams:
                above = float(e[max(0, s - band):s, :].mean())
                below = float(e[s:s + band, :].mean())
                left = float(e[:, max(0, s - band):s].mean())
                right = float(e[:, s:s + band].mean())
                interior = float(e[s + band:2 * s - band, :].mean()) if 2 * s - band > s + band else None
                done[f'h{h} seam@{s}'] = {
                    'above': f'{above:.2e}', 'below': f'{below:.2e}',
                    'left': f'{left:.2e}', 'right': f'{right:.2e}',
                    'interior': f'{interior:.2e}' if interior is not None else None,
                }
            _save(done)
            print(f'h{h}: {done[f"h{h} seam_db"]} dB', flush=True)

    if not args.skip_bench and 'h12 bf16 mps' not in done:
        # the one cell sweep_halo never measured
        mps = bs.measure_tpu_tiled(model, c['tiled_input'], TILE,
                                   batch_size=2, dtype=jnp.bfloat16, halo=12)
        done['h12 bf16 mps'] = round(mps, 3)
        _save(done)
        print(f'h12 bf16: {mps:.3f} MP/s', flush=True)

    print(json.dumps(done, indent=1))
    return 0


if __name__ == '__main__':
    sys.exit(main())
