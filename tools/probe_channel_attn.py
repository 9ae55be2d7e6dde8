#!/usr/bin/env python
"""Full-sequence channel attention (DAT/FDAT): explicit token-transpose vs
einsum-direct (the rewrite that won 2.6-3.4x for OmniSR's windowed variant).

A: q.reshape(b,n,h,d).transpose(0,2,3,1) materializes (b,h,d,n) with the
   full token sequence in lanes, twice per qkv + once back.
B: einsum('bnhd,bnhe->bhde') — contraction over n directly, no transpose.

    python tools/probe_channel_attn.py
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
    print(f'{label:48s} {per_op * 1e3:8.3f} ms', flush=True)
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
    # (label, b, hw, c, heads) at family-table serving shapes
    cases = [
        ('dat-s 128^2 b2 c180 h6', 2, 128, 180, 6),
        ('dat-s 128^2 b8 c180 h6', 8, 128, 180, 6),
        ('fdat-m 160^2 b4 c120 h4', 4, 160, 120, 4),
    ]
    for label, b, s, c, heads in cases:
        hd = c // heads
        n = s * s
        dt = jnp.bfloat16
        xs = jnp.asarray(rng.standard_normal((b, n, c)) * 0.1, dt)
        wqkv = jnp.asarray(rng.standard_normal((3 * c, c)) * 0.05, jnp.float32)
        wout = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
        temp = jnp.asarray(rng.standard_normal((heads,)), jnp.float32)

        def attn_a(xs, c=c, heads=heads, hd=hd, n=n, wqkv=wqkv, wout=wout, temp=temp):
            qkv = F.linear(xs, wqkv)
            q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
            q = q.reshape(-1, n, heads, hd).transpose(0, 2, 3, 1)
            k = k.reshape(-1, n, heads, hd).transpose(0, 2, 3, 1)
            v = v.reshape(-1, n, heads, hd).transpose(0, 2, 3, 1)
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
            attn = jnp.einsum('bhdn,bhen->bhde', q, k, preferred_element_type=jnp.float32).astype(xs.dtype)
            attn = F.softmax(attn * temp.astype(xs.dtype).reshape(1, heads, 1, 1))
            out = jnp.einsum('bhde,bhen->bhdn', attn, v, preferred_element_type=jnp.float32).astype(xs.dtype)
            out = out.transpose(0, 3, 1, 2).reshape(-1, n, c)
            return F.linear(out, wout)

        def attn_b(xs, c=c, heads=heads, hd=hd, n=n, wqkv=wqkv, wout=wout, temp=temp):
            qkv = F.linear(xs, wqkv)
            q = qkv[..., :c].reshape(-1, n, heads, hd)
            k = qkv[..., c : 2 * c].reshape(-1, n, heads, hd)
            v = qkv[..., 2 * c :].reshape(-1, n, heads, hd)
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            k = k / jnp.maximum(jnp.linalg.norm(k, axis=1, keepdims=True), 1e-12)
            attn = jnp.einsum('bnhd,bnhe->bhde', q, k, preferred_element_type=jnp.float32).astype(xs.dtype)
            attn = F.softmax(attn * temp.astype(xs.dtype).reshape(1, heads, 1, 1))
            out = jnp.einsum('bhde,bnhe->bnhd', attn, v, preferred_element_type=jnp.float32).astype(xs.dtype)
            return F.linear(out.reshape(-1, n, c), wout)

        ya = np.asarray(attn_a(xs), np.float32)
        yb = np.asarray(attn_b(xs), np.float32)
        err = np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-6)
        print(f'-- {label}: rel err {err:.2e}')
        bench(attn_a, xs, '  A token-transpose')
        bench(attn_b, xs, '  B einsum-direct')
    return 0


if __name__ == '__main__':
    sys.exit(main())
