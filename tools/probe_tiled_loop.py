#!/usr/bin/env python
"""Validate the on-device-looped tiled measurement (benchmark.measure_tiled)
against direct single-dispatch timing (bench_suite.measure_tpu_tiled).

Two failure modes to rule out (CLAUDE.md):
  * the fori_loop methodology breaks on LARGE transformer bodies (round-1:
    SwinIR-M @>=192^2 loop ran 5-30x slower than direct dispatch) — a loop
    number FAR BELOW direct means the loop is broken for that config;
  * short (~1-3 s) single-dispatch timings sit in the tunnel-noise regime
    (the rgt 2.2-3.8 MP/s spread) — a loop number moderately ABOVE direct
    is the dispatch latency + jitter the loop legitimately cancels.

Run each config twice with both methodologies; results to
probe_tiled_loop.json (resumable).

    python tools/probe_tiled_loop.py [--arch rgt,hat,dat,atd,swinir,drct,fdat]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))
OUT = os.path.join(REPO, 'probe_tiled_loop.json')

import bench_suite as bs  # noqa: E402
import sweep_tiled as st  # noqa: E402

from resselt_tpu.benchmark import measure_tiled  # noqa: E402


def _measure_direct(model, hw, tile, dtype) -> float:
    """One timed single-dispatch frame (pre-uploaded input, scalar-readback
    sync) — the methodology bench_suite used before switching to the loop."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from resselt_tpu.parallel import upscale_tiled

    img = jax.device_put(
        np.random.default_rng(0).random((hw[0], hw[1], 3), dtype=np.float32))
    kw = dict(tile=tile, halo=16, dtype=dtype)
    float(jnp.sum(upscale_tiled(model, img, **kw).astype(jnp.float32)))  # compile + warm
    t0 = time.perf_counter()
    out = upscale_tiled(model, img, **kw)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return out.shape[0] * out.shape[1] / 1e6 / dt


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--arch', default='rgt,atd,dat,hat,swinir,drct,fdat')
    ap.add_argument('--runs', type=int, default=2)
    args = ap.parse_args(argv)

    bs._enable_cache()
    import jax.numpy as jnp

    import resselt_tpu

    done = {}
    if os.path.exists(OUT):
        done = json.load(open(OUT))

    cfgs = bs._torch_models(False)
    for arch in args.arch.split(','):
        if arch in st.ROW:
            c = cfgs[st.ROW[arch]]
            ctor = c['model']
            hw = c.get('tiled_input') or st.HW[arch]
        else:
            import bench_families as bf

            ctor, _, _ = bf._configs()[st.FAMILY_ROW[arch]]
            hw = st.HW[arch]
        model = None
        # serving config: loader hints (tile/batch resolved inside the driver)
        for dname, dt in (('f32', None), ('bf16', jnp.bfloat16)):
            for run_i in range(args.runs):
                for meth in ('direct', 'loop'):
                    key = f'{arch} {dname} {meth} r{run_i}'
                    if key in done:
                        continue
                    if model is None:
                        model = resselt_tpu.load_from_state_dict(bs._sd_numpy(ctor().eval()))
                    from resselt_tpu.parallel.tiling import _resolve_tile_hint
                    # per-dtype dict hints resolve per serving dtype (advisor r4)
                    tile = _resolve_tile_hint(model, dt if dt is not None else jnp.float32)
                    try:
                        if meth == 'direct':
                            mps = _measure_direct(model, hw, tile, dt)
                        else:
                            mps, _ = measure_tiled(model, hw, tile=tile, dtype=dt)
                    except Exception as e:
                        done[key] = f'FAIL {type(e).__name__}: {str(e)[:100]}'
                        bs.log(key, '->', done[key])
                    else:
                        done[key] = round(mps, 3)
                        bs.log(key, '->', done[key])
                    json.dump(done, open(OUT, 'w'), indent=1)
    for k in sorted(done):
        print(k, done[k])
    return 0


if __name__ == '__main__':
    sys.exit(main())
