#!/usr/bin/env python
"""OmniSR block/grid window attention formulations (10.9 ms each in
profile_omni.py for ~17 GFLOP useful = 1.6 TFLOP/s).

A: current — explicit (0,2,1,3) head-split transposes around the einsums.
B: einsum-direct on (bq, n, heads, hd) reshapes; head stays a batch dim
   inside dot_general, no materialized transpose.

    python tools/probe_omni_wattn.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def bench(fn, x, label, reps=4, min_seconds=1.5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x0, n):
        def body(_, carry):
            y = carry
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
    print(f'{label:44s} {per_op * 1e3:8.3f} ms', flush=True)
    return per_op


def main():
    import jax.numpy as jnp

    from resselt_tpu.nn import functional as F

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    rng = np.random.default_rng(0)
    b, s, c, ws, heads = 8, 256, 64, 8, 4
    hd = c // heads
    n = ws * ws
    bq = b * (s // ws) * (s // ws)  # 8192 windows
    dt = jnp.bfloat16
    xw = jnp.asarray(rng.standard_normal((bq, n, c)) * 0.1, dt)
    wqkv = jnp.asarray(rng.standard_normal((3 * c, c)) * 0.05, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)), jnp.float32)

    def attn_a(xw):
        qkv = F.linear(xw, wqkv)
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        q = q.reshape(bq, n, heads, hd).transpose(0, 2, 1, 3) * (hd**-0.5)
        k = k.reshape(bq, n, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bq, n, heads, hd).transpose(0, 2, 1, 3)
        sim = jnp.einsum('bhnd,bhmd->bhnm', q, k, preferred_element_type=jnp.float32).astype(xw.dtype)
        sim = sim + bias.astype(xw.dtype)[None]
        attn = F.softmax(sim)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v, preferred_element_type=jnp.float32).astype(xw.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(bq, n, c)
        return F.linear(out, wout)

    def attn_b(xw):
        qkv = F.linear(xw, wqkv)
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        q = q.reshape(bq, n, heads, hd) * (hd**-0.5)
        k = k.reshape(bq, n, heads, hd)
        v = v.reshape(bq, n, heads, hd)
        sim = jnp.einsum('bnhd,bmhd->bhnm', q, k, preferred_element_type=jnp.float32).astype(xw.dtype)
        sim = sim + bias.astype(xw.dtype)[None]
        attn = F.softmax(sim)
        out = jnp.einsum('bhnm,bmhd->bnhd', attn, v, preferred_element_type=jnp.float32).astype(xw.dtype)
        return F.linear(out.reshape(bq, n, c), wout)

    ya = np.asarray(attn_a(xw), np.float32)
    yb = np.asarray(attn_b(xw), np.float32)
    err = np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-6)
    print(f'rel err A vs B: {err:.2e}')
    bench(attn_a, xw, 'A explicit head transposes')
    bench(attn_b, xw, 'B einsum-direct')
    return 0


if __name__ == '__main__':
    sys.exit(main())
