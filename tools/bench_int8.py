#!/usr/bin/env python
"""int8 quantized serving: speed vs bf16 and quality vs f32, per family.

    python tools/bench_int8.py [--only SUBSTR]

Speed: calibrated on-device loop (whole model, serving shapes from the
family table).  Quality: PSNR of the int8 output vs the same model's
f32 output on a random image (random reference weights; real-checkpoint
PSNR is environment-gated like the rest of the oracle corpus).
Results: bench_int8.md (+ resumable bench_int8.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_mps(model, tile: int, batch: int, dtype):
    import jax
    import jax.numpy as jnp

    from resselt_tpu.core.factory import _dispatch_flags

    scale = model.metadata.upscale
    x = jnp.asarray(np.random.default_rng(0).random((batch, tile, tile, 3)), dtype)
    flags = _dispatch_flags()

    @jax.jit
    def loop(x0, n):
        def body(_, y):
            out = model._jitted(flags, model.params, y)  # noqa: SLF001
            return (y + 1e-6 * out[:, :tile, :tile, :].astype(y.dtype)
                    if scale == 1 else y * 0.999 + 1e-4 * jnp.mean(out).astype(y.dtype))

        return jnp.sum(jax.lax.fori_loop(0, n, body, x0).astype(jnp.float32))

    float(loop(x, jnp.int32(2)))
    t0 = time.perf_counter()
    float(loop(x, jnp.int32(2)))
    dt1 = time.perf_counter() - t0
    n2 = 2 + max(2, int(2.0 / max(dt1, 1e-3)) + 1)
    t0 = time.perf_counter()
    float(loop(x, jnp.int32(n2)))
    dt2 = time.perf_counter() - t0
    per = max(dt2 - dt1, 1e-6) / (n2 - 2)
    mp = batch * (tile * scale) ** 2 / 1e6
    return mp / per, per


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    peak = float(max(np.abs(b).max(), 1.0))
    return 99.0 if mse == 0 else 10 * np.log10(peak * peak / mse)


def _configs():
    sys.path.insert(0, '/root/reference')
    import torch

    torch.set_grad_enabled(False)
    torch.manual_seed(0)
    from resselt.archs.compact.arch import SRVGGNetCompact
    from resselt.archs.esrgan.arch import RRDBNet
    from resselt.archs.plksr.plksr import plksr
    from resselt.archs.rcan.arch import RCAN
    from resselt.archs.span.arch import SPAN

    return {
        'compact 4x': (lambda: SRVGGNetCompact(num_conv=32, upscale=4), 256, 8),
        'span 4x': (lambda: SPAN(num_in_ch=3, num_out_ch=3, upscale=4), 256, 8),
        'esrgan 4x': (lambda: RRDBNet(3, 3, scale=4), 256, 16),
        'rcan 4x': (lambda: RCAN(scale=4), 256, 8),
        'plksr 4x': (lambda: plksr(upscaling_factor=4), 256, 8),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', default=None)
    ap.add_argument('--force', action='store_true')
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax.numpy as jnp

    import resselt_tpu

    state_path = os.path.join(REPO, 'bench_int8.json')
    rows = json.load(open(state_path)) if os.path.exists(state_path) else {}
    for name, (build, tile, batch) in _configs().items():
        if args.only and args.only not in name:
            continue
        if name in rows and not args.force:
            log(f'== {name} == cached')
            continue
        log(f'== {name} ==')
        tm = build()
        sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
        del tm
        model = resselt_tpu.load_from_state_dict(sd)
        qm = model.quantize_int8()
        n8 = sum(1 for v in qm.params.values() if str(v.dtype) == 'int8')

        x = np.random.default_rng(1).random((1, 64, 72, 3), dtype=np.float32)
        fp = np.asarray(model(x))
        q8 = np.asarray(qm(x))
        p = psnr(q8, fp)

        mps_bf16, _ = measure_mps(model, tile, batch, jnp.bfloat16)
        mps_int8, _ = measure_mps(qm, tile, batch, jnp.bfloat16)
        log(f'  {n8} convs int8; bf16 {mps_bf16:.1f} -> int8 {mps_int8:.1f} MP/s '
            f'({mps_int8 / mps_bf16:.2f}x); psnr vs f32 {p:.1f} dB')
        rows[name] = {
            'tile': tile, 'batch': batch, 'n_int8_convs': n8,
            'mps_bf16': round(mps_bf16, 1), 'mps_int8': round(mps_int8, 1),
            'speedup': round(mps_int8 / mps_bf16, 2), 'psnr_vs_f32_db': round(p, 1),
        }
        json.dump(rows, open(state_path, 'w'), indent=1)

    lines = [
        '# int8 quantized serving (TPU v5e, tools/bench_int8.py)',
        '',
        '**Measured NOT beneficial for the standard SR families** — int8 only',
        'beats bf16 at >= 128 channels (probe_int8.py), SR stacks are 48-64ch',
        'where bf16 already runs at the padded-MXU roofline, and even static',
        'scales with an int8-resident chain gain zero (probe_int8_static.py).',
        'Kept as a tested opt-in (`model.quantize_int8()` / `--int8`) for',
        'custom wide-conv models. Scheme: per-out-channel int8 weights +',
        'dynamic per-tensor activation quant, int32 accumulate. PSNR is',
        'int8-vs-f32 on the same random-weight model (relative quality cost).',
        '',
        '| config | tile | batch | int8 convs | bf16 MP/s | int8 MP/s | speedup | PSNR vs f32 (dB) |',
        '|---|---|---|---|---|---|---|---|',
    ]
    for name, r in rows.items():
        lines.append(
            f"| {name} | {r['tile']} | {r['batch']} | {r['n_int8_convs']} | {r['mps_bf16']} "
            f"| {r['mps_int8']} | {r['speedup']}x | {r['psnr_vs_f32_db']} |"
        )
    with open(os.path.join(REPO, 'bench_int8.md'), 'w') as f:
        f.write('\n'.join(lines) + '\n')
    log('wrote bench_int8.md')
    return 0


if __name__ == '__main__':
    sys.exit(main())
