#!/usr/bin/env python
"""On-hardware probe for the fused MOLRCM kernel (ops/molrcm.py).

    python tools/probe_molrcm.py [--tile 256] [--batch 8] [--dim 64]

Protocol (CLAUDE.md kernel rules): correctness on the live chip at a small
shape first, then the bench shape, then calibrated-loop timing (amortized
>=2 ops/iteration, >=1.5 s on-device) of the fused kernel vs the XLA chain
at the bench_families EIMN shape (256^2 b8 dim64 f32).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def bench(fn, x, label, reps=4, min_seconds=1.5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x0, n):
        def body(_, y):
            for _ in range(reps):
                y = y + jnp.asarray(1e-6, y.dtype) * fn(y)
            return y

        return jnp.sum(jax.lax.fori_loop(0, n, body, x0).astype(jnp.float32))

    float(loop(x, jnp.int32(2)))
    t0 = time.perf_counter()
    float(loop(x, jnp.int32(2)))
    dt1 = time.perf_counter() - t0
    n2 = 2 + max(2, int(2 * min_seconds / max(dt1, 1e-3)) + 1)
    t0 = time.perf_counter()
    float(loop(x, jnp.int32(n2)))
    dt2 = time.perf_counter() - t0
    per_op = max(dt2 - dt1, 1e-6) / ((n2 - 2) * reps)
    print(f'{label:40s} {per_op * 1e3:8.3f} ms', flush=True)
    return per_op


def make_params(d, rng):
    import jax.numpy as jnp

    from resselt_tpu.nn.params import PTree

    params = {}

    def conv(name, o, i, k):
        params[f'{name}.weight'] = jnp.asarray(rng.standard_normal((o, i, k, k), np.float32) * 0.1)
        params[f'{name}.bias'] = jnp.asarray(rng.standard_normal((o,), np.float32) * 0.1)

    c1, c2 = int(3 / 8 * d), int(1 / 8 * d)
    conv('proj_value.0', d, d, 1)
    conv('proj_query.0', d, d, 1)
    conv('region', d, 1, 5)
    conv('spatial_1', c1, 1, 5)
    conv('spatial_2', d - c1 - c2, 1, 7)
    conv('fusion', d, d, 1)
    conv('out', d, d, 1)
    return PTree(params)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--tile', type=int, default=256)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--dim', type=int, default=64)
    ap.add_argument('--skip-timing', action='store_true')
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax
    import jax.numpy as jnp

    from resselt_tpu.archs.eimn import _molrcm
    from resselt_tpu.ops import molrcm as M

    print('backend:', jax.default_backend(), jax.devices()[0], flush=True)
    d = args.dim
    rng = np.random.default_rng(0)
    p = make_params(d, rng)

    for shape in [(1, 40, 56, d), (1, args.tile, args.tile, d)]:
        x = jnp.asarray(rng.standard_normal(shape, np.float32) * 0.3)
        M.use_fused_molrcm(False)
        want = np.asarray(_molrcm(p, x, d))
        print(f'xla chain ok @ {shape}', flush=True)
        got = np.asarray(M.fused_molrcm(p, x, d))
        scale = np.abs(want).max()
        err = np.abs(got - want).max() / scale
        print(f'fused kernel @ {shape}: rel err {err:.2e}', flush=True)
        assert err < 1.5e-3, err

    if args.skip_timing:
        return

    x = jnp.asarray(
        rng.standard_normal((args.batch, args.tile, args.tile, d), np.float32) * 0.3)
    M.use_fused_molrcm(False)
    t_xla = bench(lambda y: _molrcm(p, y, d), x, f'xla chain {args.tile}^2 b{args.batch}')
    M.use_fused_molrcm(True)
    t_fused = bench(lambda y: _molrcm(p, y, d), x, f'fused kernel {args.tile}^2 b{args.batch}')
    print(f'speedup: {t_xla / t_fused:.2f}x', flush=True)


if __name__ == '__main__':
    main()
