#!/usr/bin/env python
"""Measure this chip's matmul peak several ways.

The BENCHMARKS.md roofline uses "bf16 matmul ~64 TFLOPS at 4096^3"
(v5e nominal is ~197).  This probes whether 64 is the chip's real
delivered peak or a measurement artifact: chained-dependency loops at
several sizes/dtypes, plus a variant with G independent matmuls per
iteration (dependency only between iterations, not between the G dots).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def bench_loop(make_body, x0, flop_per_iter, label, min_seconds=2.0):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x, n):
        body = make_body()
        y = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(jax.tree.leaves(y)[0][:8, :8].astype(jnp.float32))

    float(loop(x0, jnp.int32(2)))
    t0 = time.perf_counter()
    float(loop(x0, jnp.int32(2)))
    dt1 = time.perf_counter() - t0
    n2 = 2 + max(2, int(2 * min_seconds / max(dt1, 1e-3)) + 1)
    t0 = time.perf_counter()
    float(loop(x0, jnp.int32(n2)))
    dt2 = time.perf_counter() - t0
    per_iter = max(dt2 - dt1, 1e-6) / (n2 - 2)
    tflops = flop_per_iter / per_iter / 1e12
    print(f'{label:44s} {per_iter * 1e3:9.3f} ms/iter  {tflops:7.1f} TFLOP/s', flush=True)
    return tflops


def main():
    import jax
    import jax.numpy as jnp

    print('backend:', jax.default_backend(), jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    for m in (4096, 8192):
        for dt in (jnp.bfloat16, jnp.float32):
            a = jnp.asarray(rng.standard_normal((m, m), np.float32) * 0.01, dt)
            b = jnp.asarray(rng.standard_normal((m, m), np.float32) * 0.01, dt)

            def mk(a=a, b=b, dt=dt):
                def body(_, y):
                    # renormalizing chained matmul: y <- (y @ b) * eps + a
                    return (y @ b) * jnp.asarray(1e-3, dt) + a
                return body

            bench_loop(mk, a, 2 * m * m * m, f'chain {m}^3 {jnp.dtype(dt).name}')

        # G independent dots per iteration: inter-iteration dependency only
        g, mm = 4, m
        a = jnp.asarray(rng.standard_normal((g, mm, mm), np.float32) * 0.01, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((g, mm, mm), np.float32) * 0.01, jnp.bfloat16)

        def mkg(a=a, b=b):
            def body(_, y):
                z = jnp.einsum('gij,gjk->gik', y, b,
                               preferred_element_type=jnp.bfloat16)
                return z * jnp.asarray(1e-3, jnp.bfloat16) + a
            return body

        bench_loop(mkg, a, 2 * g * mm * mm * mm, f'batch{g} {mm}^3 bf16')


if __name__ == '__main__':
    main()
