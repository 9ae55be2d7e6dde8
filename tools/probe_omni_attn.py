#!/usr/bin/env python
"""OmniSR channel-attention formulations (profile_omni.py: 15-19 ms each,
~47% of the OSA block, while the einsum math is ~2 GFLOP).

A: current arch formulation — split() materializes 7-D transposes that put
   window positions in the lane dim.
B: window-first — partition with the measured-fast _block_windows-style
   reshapes, keep channels last, contract tokens inside einsum.

    python tools/probe_omni_attn.py
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
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, s, s, c)) * 0.1, dt)
    wqkv = jnp.asarray(rng.standard_normal((3 * c, c, 1, 1)) * 0.05, jnp.float32)
    wdw = jnp.asarray(rng.standard_normal((3 * c, 1, 3, 3)) * 0.05, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((c, c, 1, 1)) * 0.05, jnp.float32)
    temp = jnp.asarray(rng.standard_normal((heads, 1, 1)), jnp.float32)

    def qkv_of(y):
        q = F.conv2d(y, wqkv)
        return F.conv2d(q, wdw, padding=1, groups=3 * c)

    def attn_a(y, grid: bool):
        """Current formulation (archs/omni.py::_channel_attn)."""
        qkv = qkv_of(y)
        h = w = s

        def split(t):
            t = t.reshape(b, h // ws, ws, w // ws, ws, heads, hd)
            if grid:
                t = t.transpose(0, 2, 4, 5, 6, 1, 3).reshape(b, ws * ws, heads, hd, (h // ws) * (w // ws))
            else:
                t = t.transpose(0, 1, 3, 5, 6, 2, 4).reshape(b, (h // ws) * (w // ws), heads, hd, ws * ws)
            return t

        q, k, v = split(qkv[..., :c]), split(qkv[..., c : 2 * c]), split(qkv[..., 2 * c :])
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum('bwhdf,bwhef->bwhde', q, k, preferred_element_type=jnp.float32).astype(y.dtype)
        attn = F.softmax(attn * temp.astype(y.dtype).reshape(1, 1, heads, 1, 1))
        out = jnp.einsum('bwhde,bwhef->bwhdf', attn, v, preferred_element_type=jnp.float32).astype(y.dtype)
        if grid:
            out = out.reshape(b, ws, ws, heads, hd, h // ws, w // ws).transpose(0, 5, 1, 6, 2, 3, 4)
        else:
            out = out.reshape(b, h // ws, w // ws, heads, hd, ws, ws).transpose(0, 1, 5, 2, 6, 3, 4)
        out = out.reshape(b, h, w, c)
        return F.conv2d(out, wout)

    def attn_b(y, grid: bool):
        """Window-first: tokens stay in sublanes, channels in lanes."""
        qkv = qkv_of(y)
        h = w = s
        X, Y = h // ws, w // ws
        if grid:
            # window = within-window offset (p,q); tokens = grid positions
            t = qkv.reshape(b, X, ws, Y, ws, 3 * c).transpose(0, 2, 4, 1, 3, 5)
            t = t.reshape(b * ws * ws, X * Y, 3 * c)
        else:
            # window = spatial block; tokens = within-window positions
            t = qkv.reshape(b, X, ws, Y, ws, 3 * c).transpose(0, 1, 3, 2, 4, 5)
            t = t.reshape(b * X * Y, ws * ws, 3 * c)
        n = t.shape[1]
        q, k, v = t[..., :c], t[..., c : 2 * c], t[..., 2 * c :]
        q = q.reshape(-1, n, heads, hd)
        k = k.reshape(-1, n, heads, hd)
        v = v.reshape(-1, n, heads, hd)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=1, keepdims=True), 1e-12)
        attn = jnp.einsum('bnhd,bnhe->bhde', q, k, preferred_element_type=jnp.float32).astype(y.dtype)
        attn = F.softmax(attn * temp.astype(y.dtype)[None])
        out = jnp.einsum('bhde,bnhe->bnhd', attn, v, preferred_element_type=jnp.float32).astype(y.dtype)
        out = out.reshape(-1, n, c)
        if grid:
            out = out.reshape(b, ws, ws, X, Y, c).transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, c)
        else:
            out = out.reshape(b, X, Y, ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        return F.conv2d(out, wout)

    for grid in (False, True):
        ya = np.asarray(attn_a(x, grid), np.float32)
        yb = np.asarray(attn_b(x, grid), np.float32)
        err = np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-6)
        print(f'-- grid={grid}: rel err A vs B {err:.2e}')
        bench(lambda y, g=grid: attn_a(y, g), x, f'  A current split()  grid={grid}')
        bench(lambda y, g=grid: attn_b(y, g), x, f'  B window-first     grid={grid}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
