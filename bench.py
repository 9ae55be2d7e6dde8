#!/usr/bin/env python
"""Benchmark: 4x SR output megapixels/sec/chip vs the PyTorch-CPU reference.

Headline config (BASELINE.json): ESRGAN RRDBNet 4x (23 blocks, 64 filters)
on 256x256 RGB tiles.  Prints ONE JSON line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": speedup}

Un-killable by construction (VERDICT-r4 #1: round 4's bench died rc=124
with no output when the tunnel wedged).  The TPU measurement runs in a
CHILD process streaming phase-progress lines; the parent enforces a hard
wall-clock budget ($BENCH_BUDGET_S, default 420 s) plus a stall timeout,
and always emits valid JSON — the best-so-far estimate if the child had
one, an explicit error JSON otherwise.  A blocked jax readback cannot be
interrupted in-process (SIGALRM never fires inside the C++ runtime), so
the subprocess boundary is the only reliable guard.

The torch-CPU baseline (the reference implementation running the same
weights) is measured once and cached in .bench_baseline.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
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
BUDGET_S = float(os.environ.get('BENCH_BUDGET_S', '420'))
STALL_S = float(os.environ.get('BENCH_STALL_S', '240'))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_sd():
    from resselt_tpu.zoo import make_esrgan

    return make_esrgan(
        num_filters=CONFIG['num_filters'], num_blocks=CONFIG['num_blocks'], scale=CONFIG['scale'], seed=0
    )


# ---------------------------------------------------------------- child ---

def child_measure(deadline_s: float) -> None:
    """On-device dependency-chained loop, synced via scalar readback.

    jax.block_until_ready does not reliably synchronize through the remote
    TPU tunnel, and independent repeated calls invite caching artifacts; a
    fori_loop with a data dependency plus a host-transferred scalar gives
    honest wall-clock.  Streams PROGRESS lines (phase + best per-iter
    estimate) to stdout so the parent can report best-so-far if this
    process is killed mid-run."""
    import functools

    deadline = time.perf_counter() + deadline_s

    def phase(name, **kw):
        print('PROGRESS ' + json.dumps({'phase': name, **kw}), flush=True)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax
    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.benchmark import calibrated_per_iter

    phase('backend', platform=jax.devices()[0].platform)
    sd = build_sd()
    model = resselt_tpu.load_from_state_dict(sd)
    phase('loaded')
    b, t, s = CONFIG['batch'], CONFIG['tile'], CONFIG['scale']
    params = model.params
    x = jnp.asarray(np.random.default_rng(0).random((b, t, t, 3), dtype=np.float32))
    if CONFIG.get('dtype') == 'bf16':
        params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v) for k, v in params.items()}
        x = x.astype(jnp.bfloat16)
    apply_fn = functools.partial(model._apply_fn, model.config)

    @jax.jit
    def loop(p, x0, n):
        def body(_, carry):
            y = apply_fn(p, carry)
            return carry + jnp.asarray(1e-6, carry.dtype) * y[:, :t, :t, :]

        out = jax.lax.fori_loop(0, n, body, x0)
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.perf_counter()
    float(loop(params, x, jnp.int32(2)))  # compile + warm (sync via readback)
    phase('compiled', compile_s=round(time.perf_counter() - t0, 1))

    def run(n):
        t0 = time.perf_counter()
        float(loop(params, x, jnp.int32(n)))
        return time.perf_counter() - t0

    mp_per_iter = (t * s) ** 2 * b / 1e6

    def note(stage, per_iter):
        phase(stage, per_iter=per_iter, mps=round(mp_per_iter / per_iter, 3))

    # two-run delta cancels the fixed dispatch+readback tunnel latency
    # (a single timed run under-reports by the ~0.1-0.3 s fixed cost)
    per_iter = calibrated_per_iter(run, 2, min_seconds=3.0,
                                   deadline=deadline, progress=note)
    mps = mp_per_iter / per_iter
    log(f'tpu: {mps:.2f} MP/s out ({per_iter * 1e3:.1f} ms/batch of {b})')
    print('RESULT ' + json.dumps({'mps': mps, 'per_iter': per_iter}), flush=True)


# --------------------------------------------------------------- parent ---

def measure_tpu_guarded(deadline: float) -> tuple[float | None, str | None]:
    """Run child_measure in a subprocess under the wall-clock budget.

    Returns (mps, error).  mps is the child's RESULT, else the best
    PROGRESS estimate, else None with a diagnostic string."""
    remaining = deadline - time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, '-u', __file__, '--measure', f'{max(remaining - 15.0, 30.0):.0f}'],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True)
    best: dict = {}
    result: dict = {}
    lines: list[str] = []
    done = threading.Event()

    def reader():
        for line in proc.stdout:
            lines.append(line.rstrip())
            if line.startswith('PROGRESS '):
                try:
                    best.update(json.loads(line[len('PROGRESS '):]))
                    best['t'] = time.perf_counter()
                except Exception:
                    pass
                log(f'bench: {line.rstrip()}')
            elif line.startswith('RESULT '):
                try:
                    result.update(json.loads(line[len('RESULT '):]))
                except Exception:
                    pass
        done.set()

    th = threading.Thread(target=reader, daemon=True)
    start = time.perf_counter()
    th.start()
    while proc.poll() is None:
        now = time.perf_counter()
        last = best.get('t', start)
        if now > deadline or now - last > STALL_S:
            why = 'budget exceeded' if now > deadline else f'no progress for {STALL_S:.0f}s'
            log(f'bench: killing child ({why})')
            proc.kill()
            break
        time.sleep(1.0)
    proc.wait()
    done.wait(timeout=5.0)
    if 'mps' in result:
        return result['mps'], None
    if 'mps' in best:
        return best['mps'], f'partial (killed at phase {best.get("phase")})'
    tail = '; '.join(lines[-2:]) if lines else 'no output'
    return None, f'child rc={proc.returncode}, last: {tail}'


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


def main():
    deadline = time.perf_counter() + BUDGET_S
    log(f'bench: budget {BUDGET_S:.0f}s, stall timeout {STALL_S:.0f}s')
    try:
        from tools.tpu_health import check

        h = check(timeout_s=min(90.0, BUDGET_S / 4))
        log(f'tpu_health: {json.dumps(h)}')
        if not h.get('ok'):
            log('tpu_health: unhealthy — attempting measurement anyway under budget')
    except Exception as e:
        log(f'tpu_health probe failed: {e}')

    tpu_mps, err = measure_tpu_guarded(deadline)

    vs = None
    try:
        # cached-baseline read is instant; only a cache miss costs ~70 s
        if os.path.exists(CACHE) or time.perf_counter() + 90 < deadline:
            base_mps = measure_torch_cpu(build_sd())
            if tpu_mps is not None:
                vs = round(tpu_mps / base_mps, 2)
    except Exception as e:  # baseline unavailable: report raw number
        log(f'baseline measurement failed: {e}')

    out = {
        'metric': '4x SR output MP/s/chip (ESRGAN RRDBNet-23 @256px tiles, '
                  f'batch {CONFIG["batch"]}, {CONFIG.get("dtype", "f32")})',
        'value': round(tpu_mps, 3) if tpu_mps is not None else None,
        'unit': 'MP/s',
        'vs_baseline': vs,
    }
    if err:
        out['error'] = err
    print(json.dumps(out))


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == '--measure':
        child_measure(float(sys.argv[2]) if len(sys.argv) > 2 else BUDGET_S)
    else:
        main()
