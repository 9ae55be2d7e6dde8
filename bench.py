#!/usr/bin/env python
"""Benchmark: 4x SR output megapixels/sec/chip vs the PyTorch-CPU reference.

Headline config (BASELINE.json): ESRGAN RRDBNet 4x (23 blocks, 64 filters)
on 256x256 RGB tiles.  Prints ONE JSON line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": speedup}

The torch-CPU baseline (the reference implementation running the same
weights) is measured once and cached in .bench_baseline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# bf16 batch 16 is the best honest config measured in the r2 sweep
# (BENCHMARKS.md): f32 b8 13.71, bf16 b8 14.52, bf16 b16 14.79 MP/s; per-
# family bf16 parity is gated by parity_report.md (ESRGAN bf16 74 dB vs the
# f32 oracle, far above the 8-bit floor).  The torch-CPU baseline stays
# per-MP f32 at batch 1 — CPU is compute-saturated and gains nothing from
# batching, and torch-CPU bf16 is slower than f32 there.
CONFIG = {'num_blocks': 23, 'num_filters': 64, 'scale': 4, 'tile': 256, 'batch': 16, 'dtype': 'bf16'}
CACHE = os.path.join(REPO, '.bench_baseline.json')


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_sd():
    from resselt_tpu.zoo import make_esrgan

    return make_esrgan(
        num_filters=CONFIG['num_filters'], num_blocks=CONFIG['num_blocks'], scale=CONFIG['scale'], seed=0
    )


def measure_tpu(sd) -> float:
    """On-device dependency-chained loop, synced via scalar readback.

    jax.block_until_ready does not reliably synchronize through the remote
    TPU tunnel, and independent repeated calls invite caching artifacts; a
    fori_loop with a data dependency plus a host-transferred scalar gives
    honest wall-clock."""
    import functools

    import jax
    import jax.numpy as jnp

    import resselt_tpu

    model = resselt_tpu.load_from_state_dict(sd)
    b, t, s = CONFIG['batch'], CONFIG['tile'], CONFIG['scale']
    params = model.params
    x = jnp.asarray(np.random.default_rng(0).random((b, t, t, 3), dtype=np.float32))
    if CONFIG.get('dtype') == 'bf16':
        params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v) for k, v in params.items()}
        x = x.astype(jnp.bfloat16)
    apply_fn = functools.partial(model._apply_fn, model.config)
    from resselt_tpu.benchmark import calibrated_per_iter

    @jax.jit
    def loop(p, x0, n):
        def body(_, carry):
            y = apply_fn(p, carry)
            return carry + jnp.asarray(1e-6, carry.dtype) * y[:, :t, :t, :]

        out = jax.lax.fori_loop(0, n, body, x0)
        return jnp.sum(out.astype(jnp.float32))

    float(loop(params, x, jnp.int32(2)))  # compile + warm (sync via readback)

    def run(n):
        t0 = time.perf_counter()
        float(loop(params, x, jnp.int32(n)))
        return time.perf_counter() - t0

    # two-run delta cancels the fixed dispatch+readback tunnel latency
    # (a single timed run under-reports by the ~0.1-0.3 s fixed cost)
    per_iter = calibrated_per_iter(run, 2, min_seconds=3.0)
    mps = (t * s) ** 2 * b / 1e6 / per_iter
    log(f'tpu: {mps:.2f} MP/s out ({per_iter * 1e3:.1f} ms/batch of {b})')
    return mps


def measure_torch_cpu(sd) -> float:
    # baseline is always f32 batch-1 torch-CPU: exclude TPU-side knobs
    key = json.dumps({k: v for k, v in CONFIG.items() if k not in ('batch', 'dtype')}, sort_keys=True)
    if os.path.exists(CACHE):
        try:
            cached = json.load(open(CACHE))
            if cached.get('key') == key:
                log(f'torch-cpu baseline (cached): {cached["mps"]:.3f} MP/s')
                return cached['mps']
        except Exception:
            pass

    import torch

    torch.set_grad_enabled(False)
    sys.path.insert(0, '/root/reference')
    from resselt.archs.esrgan.arch import RRDBNet

    model = RRDBNet(num_filters=CONFIG['num_filters'], num_blocks=CONFIG['num_blocks'], scale=CONFIG['scale']).eval()
    model.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()})

    t, s = CONFIG['tile'], CONFIG['scale']
    x = torch.from_numpy(np.random.default_rng(0).random((1, 3, t, t), dtype=np.float32))
    with torch.inference_mode():
        model(x)  # warm
        iters = 2
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = time.perf_counter() - t0
    mps = (t * s) ** 2 * iters / 1e6 / dt
    json.dump({'key': key, 'mps': mps}, open(CACHE, 'w'))
    log(f'torch-cpu baseline: {mps:.3f} MP/s')
    return mps


def _enable_cache():
    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass


def main():
    _enable_cache()
    sd = build_sd()
    tpu_mps = measure_tpu(sd)
    try:
        base_mps = measure_torch_cpu(sd)
        vs = tpu_mps / base_mps
    except Exception as e:  # baseline unavailable: report raw number
        log(f'baseline measurement failed: {e}')
        vs = float('nan')
    print(json.dumps({
        'metric': '4x SR output MP/s/chip (ESRGAN RRDBNet-23 @256px tiles, '
                  f'batch {CONFIG["batch"]}, {CONFIG.get("dtype", "f32")})',
        'value': round(tpu_mps, 3),
        'unit': 'MP/s',
        'vs_baseline': round(vs, 2) if vs == vs else None,
    }))


if __name__ == '__main__':
    main()
