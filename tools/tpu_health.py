#!/usr/bin/env python
"""TPU tunnel health probe (VERDICT-r4 #7).

The axon tunnel can wedge silently (round-4's bench died rc=124 with zero
output; two worker crashes took it down 10-40 min).  Every bench/sweep tool
calls :func:`check` before its first compile so a wedged worker produces a
diagnostic line instead of a silent timeout.

The probe runs in a SUBPROCESS with a hard timeout: a blocked jax readback
cannot be interrupted by SIGALRM from within the process (the runtime
holds the call in C++), so in-process guards are not sufficient.

Usage:
    from tools.tpu_health import check
    h = check()          # {'ok': bool, 'init_s':..., 'compile_s':..., 'rtt_s':...}
    python tools/tpu_health.py [--timeout 90]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_CHILD = r"""
import json, os, time, sys
t0 = time.perf_counter()
import jax, jax.numpy as jnp
# tests force the CPU backend this way: the environment's sitecustomize
# force-registers the axon TPU plugin, which overrides $JAX_PLATFORMS
plat_override = os.environ.get('RESSELT_HEALTH_PLATFORM')
if plat_override:
    jax.config.update('jax_platforms', plat_override)
d = jax.devices()
init_s = time.perf_counter() - t0
plat = d[0].platform
t0 = time.perf_counter()
@jax.jit
def f(x, n):
    def body(_, c):
        return c @ x * jnp.asarray(0.999, c.dtype)
    return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))
x = jnp.ones((512, 512), jnp.bfloat16)
v = float(f(x, jnp.int32(2)))
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
v = float(f(x, jnp.int32(2)))
rtt_s = time.perf_counter() - t0
print('HEALTH ' + json.dumps({'ok': True, 'platform': plat, 'devices': len(d),
      'init_s': round(init_s, 2), 'compile_s': round(compile_s, 2),
      'rtt_s': round(rtt_s, 3)}), flush=True)
"""


def check(timeout_s: float = 90.0, env: dict | None = None) -> dict:
    """Probe device init + compile + round-trip in a subprocess.

    Returns a dict with ``ok`` plus timings, or ``ok: False`` with a
    ``reason`` ('timeout' / 'crash') when the tunnel is wedged.  Never
    raises, never hangs past ``timeout_s``.
    """
    child_env = dict(os.environ)
    if env:
        child_env.update(env)
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, '-u', '-c', _CHILD], env=child_env,
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {'ok': False, 'reason': 'timeout', 'timeout_s': timeout_s}
    wall = time.perf_counter() - t0
    for line in r.stdout.splitlines():
        if line.startswith('HEALTH '):
            out = json.loads(line[len('HEALTH '):])
            out['wall_s'] = round(wall, 2)
            return out
    tail = (r.stderr or '').strip().splitlines()[-3:]
    return {'ok': False, 'reason': 'crash', 'rc': r.returncode, 'stderr_tail': tail}


def require(timeout_s: float = 90.0, retries: int = 1, log=None) -> dict:
    """check() with one retry; prints the diagnostic; exits 3 when wedged.

    Call at the top of bench tools so a wedged worker yields a clear line.
    """
    log = log or (lambda *a: print(*a, file=sys.stderr, flush=True))
    for attempt in range(retries + 1):
        h = check(timeout_s)
        log(f'tpu_health: {json.dumps(h)}')
        if h.get('ok'):
            return h
        if attempt < retries:
            log('tpu_health: unhealthy, retrying in 30 s...')
            time.sleep(30)
    log('tpu_health: TPU tunnel wedged — aborting before first compile')
    sys.exit(3)


if __name__ == '__main__':
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument('--timeout', type=float, default=90.0)
    ap.add_argument('--retries', type=int, default=0)
    a = ap.parse_args()
    for i in range(a.retries + 1):
        h = check(a.timeout)
        print(json.dumps(h))
        if h.get('ok'):
            sys.exit(0)
        if i < a.retries:
            time.sleep(30)
    sys.exit(3)
