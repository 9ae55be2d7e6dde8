"""Per-architecture PSNR parity report vs the PyTorch reference oracle.

BASELINE.json requires <= 0.05 dB PSNR delta per registered arch; since
both implementations consume the same random weights, we report the PSNR
of (jax output vs torch output) directly — higher is better, >= 60 dB means
the implementations agree to well below 8-bit quantization.

    python tools/parity_report.py [--out parity_report.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import jax

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import jax.numpy as jnp
import numpy as np
import torch

import resselt_tpu
from tests.test_detection_matrix import _tiny_models
from tests.torch_ref import init_random, run_torch, state_dict_to_numpy


def psnr(a: np.ndarray, b: np.ndarray, peak: float) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float('inf')
    return 10.0 * np.log10(peak * peak / mse)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', default='parity_report.md')
    parser.add_argument('--size', type=int, nargs=2, default=(33, 41))
    args = parser.parse_args()

    torch.manual_seed(0)
    models = _tiny_models()
    rows = []
    h, w = args.size
    for name, ref in models.items():
        expect = name.split('-')[0]
        ref = init_random(ref, seed=hash(name) % 2**31).eval()
        if expect == 'FIGSR':  # restore non-trainable eps/rms buffers
            for m in ref.modules():
                if hasattr(m, 'rms') and isinstance(getattr(m, 'rms', None), torch.nn.Parameter):
                    with torch.no_grad():
                        m.eps.copy_(torch.ones(1) * 1e-6)
                        m.rms.copy_(torch.ones(1) * (m.scale.shape[0] ** -0.5))
        sd = state_dict_to_numpy(ref.state_dict())
        t0 = time.perf_counter()
        model = resselt_tpu.load_from_state_dict(sd)
        load_s = time.perf_counter() - t0
        hh, ww = h, w
        if expect in ('CuGAN',):
            hh, ww = 40, 48
        if expect in ('FlexNet', 'RHA', 'GateR', 'GateRv2', 'GateRV3'):
            hh, ww = 40, 48
        x = np.random.default_rng(1).random((1, hh, ww, 3), dtype=np.float32)
        try:
            want = run_torch(ref, x)
            got = np.asarray(model(x))
            peak = float(max(np.abs(want).max(), 1.0))
            p = psnr(got, want, peak)
            # bf16 fast path: quality cost of running the whole network in
            # bfloat16 (the dtype BENCHMARKS.md recommends for serving)
            got_bf16 = np.asarray(model(x, dtype=jnp.bfloat16), dtype=np.float32)
            p_bf16 = psnr(got_bf16, want, peak)
            rows.append({'arch': name, 'id': model.arch_id, 'psnr_db': round(p, 1),
                         'psnr_bf16_db': round(p_bf16, 1),
                         'max_err': float(np.abs(got - want).max()), 'load_s': round(load_s, 2),
                         'out_shape': list(got.shape)})
            print(f'{name:12s} id={model.arch_id:10s} psnr={p:7.1f} dB  bf16={p_bf16:5.1f} dB  max_err={np.abs(got - want).max():.2e}')
        except Exception as e:  # pragma: no cover
            rows.append({'arch': name, 'id': model.arch_id, 'error': str(e)})
            print(f'{name:12s} ERROR {e}')

    ok = [r for r in rows if r.get('psnr_db', 0) >= 55]
    lines = [
        '# Parity report: resselt_tpu vs PyTorch reference',
        '',
        f'{len(ok)}/{len(rows)} architectures at >= 55 dB agreement '
        '(same random weights, f32; >= 60 dB is below 8-bit quantization error; '
        'the BASELINE 0.05 dB PSNR-delta budget corresponds to ~40+ dB agreement).',
        '',
        'The bf16 column runs the whole network in bfloat16 (the serving fast '
        'path) against the same f32 torch oracle: >= 40 dB keeps the bf16 '
        'recommendation within the BASELINE PSNR budget.',
        '',
        '| arch | id | PSNR f32 (dB) | PSNR bf16 (dB) | max err (f32) |',
        '|---|---|---|---|---|',
    ]
    for r in rows:
        if 'error' in r:
            lines.append(f"| {r['arch']} | {r['id']} | ERROR | - | {r['error'][:60]} |")
        else:
            lines.append(
                f"| {r['arch']} | {r['id']} | {r['psnr_db']} | {r.get('psnr_bf16_db', '-')} "
                f"| {r['max_err']:.2e} |"
            )
    with open(args.out, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    json.dump(rows, open(args.out.replace('.md', '.json'), 'w'), indent=1)
    print(f'wrote {args.out}')
    return 0 if len(ok) == len(rows) else 1


if __name__ == '__main__':
    sys.exit(main())
