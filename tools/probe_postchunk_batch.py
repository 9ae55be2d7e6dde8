#!/usr/bin/env python
"""Post-chunked-attention re-probe of tiled serving batch hints.

Chunked window attention (nn/window.py::use_chunked_attention) removed the
>=128-stacked-window XLA batching cliff that the round-3 joint tile x batch
sweep (sweep_tiled.json) was measured under.  That cliff is what penalized
larger tile batches for the attention families, so the swept hints
(hat t192 b2, dat t128 b4/b8, atd t192 b1/b2) may now be leaving batch
amortization on the table.  This measures the plausible-upgrade cells AND
the current-hint baseline cells end-to-end (exactly
bench_suite.measure_tpu_tiled) so every verdict is a same-run comparison,
and records them in probe_postchunk_batch.json (resumable; atomic writes).

    python tools/probe_postchunk_batch.py [--arch hat,dat,atd]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))
OUT = os.path.join(REPO, 'probe_postchunk_batch.json')

import bench_suite as bs  # noqa: E402

ROW = {'hat': 'hat-s 4x tiled-HD', 'dat': 'dat-s 4x tiled-HD',
       'atd': 'atd-light 4x tiled-FHD'}
# (tile, batch, dtype) cells: the current loader hints (baselines, first)
# plus the plausible upgrades, all measured in the same run.
CELLS = {
    'hat': [(192, 2, 'f32'), (192, 2, 'bf16'),  # current hints
            (192, 4, 'f32'), (192, 4, 'bf16'), (192, 8, 'bf16'),
            (128, 8, 'bf16'), (128, 8, 'f32')],
    'dat': [(128, 4, 'f32'), (128, 8, 'bf16'),  # current hints
            (128, 8, 'f32'), (128, 16, 'bf16')],
    'atd': [(192, 1, 'f32'), (192, 2, 'bf16'),  # current hints
            (192, 2, 'f32'), (192, 4, 'f32'), (192, 4, 'bf16'),
            (192, 8, 'bf16')],
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
    bad = [a for a in archs if a not in ROW]
    if bad:
        ap.error(f'unknown arch(s) {bad}; valid: {list(ROW)}')

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
    for arch in archs:
        c = cfgs[ROW[arch]]
        model = resselt_tpu.load_from_state_dict(bs._sd_numpy(c['model']()))
        hw = c['tiled_input']
        for tile, batch, dt in CELLS[arch]:
            key = f'{arch} {hw[1]}x{hw[0]} t{tile} b{batch} {dt}'
            if key in done:
                print(f'{key}: {done[key]:.2f} MP/s (cached)', flush=True)
                continue
            dtype = jnp.bfloat16 if dt == 'bf16' else jnp.float32
            mps = bs.measure_tpu_tiled(model, hw, tile, batch_size=batch,
                                       dtype=dtype)
            done[key] = mps
            _save(done)
            print(f'{key}: {mps:.2f} MP/s', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
