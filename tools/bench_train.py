#!/usr/bin/env python
"""Training-step throughput on the TPU chip (the reference ships no
training code — SURVEY.md §0 — so these are capability numbers, not
parity numbers).

Per config: full train step (fwd + bwd + Adam + EMA) with buffer
donation, measured with the calibrated on-device loop (the step chains
state -> state, so iterations have a real dependency), reported as HR
megapixels/s trained and steps/s.

    python tools/bench_train.py [--only SUBSTR]

Results: bench_train.md.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(model, crop: int, batch: int, scale: int, remat: bool = False):
    import jax
    import jax.numpy as jnp
    import optax

    from resselt_tpu.train import init_train_state, make_train_step

    step = make_train_step(
        model._apply_fn, model.config,
        optax.adam(1e-4), loss='charbonnier', ema_decay=0.999, remat=remat,
    )
    state = init_train_state(model.params, optax.adam(1e-4), ema=True)

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((batch, crop, crop, 3)), jnp.float32)
    hr = jnp.asarray(rng.random((batch, crop * scale, crop * scale, 3)), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def loop(state, n, lr, hr):
        def body(_, st):
            st, _m = step(st, lr, hr)
            return st

        st = jax.lax.fori_loop(0, n, body, state)
        return st, jnp.sum(st.params[next(iter(st.params))].astype(jnp.float32))

    st, sm = loop(state, jnp.int32(1), lr, hr)
    float(sm)
    t0 = time.perf_counter()
    st, sm = loop(st, jnp.int32(1), lr, hr)
    float(sm)
    dt1 = time.perf_counter() - t0
    n2 = 1 + max(2, int(1.5 / max(dt1, 1e-3)) + 1)
    t0 = time.perf_counter()
    st, sm = loop(st, jnp.int32(n2), lr, hr)
    float(sm)
    dt2 = time.perf_counter() - t0
    per_step = max(dt2 - dt1, 1e-6) / (n2 - 1)
    mp = batch * (crop * scale) ** 2 / 1e6
    return per_step, mp / per_step


def _configs():
    sys.path.insert(0, '/root/reference')
    import torch

    torch.set_grad_enabled(False)
    torch.manual_seed(0)
    from resselt.archs.compact.arch import SRVGGNetCompact
    from resselt.archs.esrgan.arch import RRDBNet
    from resselt.archs.span.arch import SPAN
    from resselt.archs.swinir.arch import SwinIR

    return {
        # (build, crop(LR), batch, scale, remat)
        'compact 4x': (lambda: SRVGGNetCompact(num_conv=32, upscale=4), 64, 16, 4, False),
        'span 4x': (lambda: SPAN(num_in_ch=3, num_out_ch=3, upscale=4), 64, 16, 4, False),
        'esrgan 4x': (lambda: RRDBNet(3, 3, scale=4), 48, 8, 4, True),
        'swinir-m 4x': (lambda: SwinIR(
            img_size=64, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
            window_size=8, upsampler='pixelshuffle', upscale=4, img_range=1.0), 64, 2, 4, True),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', default=None)
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import resselt_tpu

    rows = {}
    out_path = os.path.join(REPO, 'bench_train.json')
    if os.path.exists(out_path):
        rows = json.load(open(out_path))
    for name, (build, crop, batch, scale, remat) in _configs().items():
        if args.only and args.only not in name:
            continue
        log(f'== {name} ==')
        tm = build()
        sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
        del tm
        model = resselt_tpu.load_from_state_dict(sd)
        t0 = time.perf_counter()
        per_step, mps = measure(model, crop, batch, scale, remat)
        log(f'  {per_step * 1e3:.1f} ms/step, {mps:.2f} HR MP/s '
            f'(crop {crop} b{batch}, remat={remat}, {time.perf_counter() - t0:.0f}s)')
        rows[name] = {
            'crop': crop, 'batch': batch, 'scale': scale, 'remat': remat,
            'ms_per_step': round(per_step * 1e3, 2), 'hr_mps': round(mps, 2),
        }
        json.dump(rows, open(out_path, 'w'), indent=1)

    lines = [
        '# Training-step throughput (TPU v5e chip, tools/bench_train.py)',
        '',
        'Full functional train step: forward + backward + Adam + EMA(0.999),',
        'charbonnier loss, buffer donation, f32 params. The torch reference',
        'ships no training code, so there is no reference column.',
        '',
        '| config | LR crop | batch | remat | ms/step | HR MP/s |',
        '|---|---|---|---|---|---|',
    ]
    for name, r in rows.items():
        lines.append(
            f"| {name} | {r['crop']} | {r['batch']} | {'yes' if r['remat'] else 'no'} "
            f"| {r['ms_per_step']} | {r['hr_mps']} |"
        )
    with open(os.path.join(REPO, 'bench_train.md'), 'w') as f:
        f.write('\n'.join(lines) + '\n')
    log('wrote bench_train.md')
    return 0


if __name__ == '__main__':
    sys.exit(main())
