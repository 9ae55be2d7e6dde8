#!/usr/bin/env python
"""Row gather/scatter formulations for ATD's AC_MSA (probe_atd.py found
the (b, n, c) row shuffle at ~0.6 ms per direction = ~20x its bandwidth
floor; the argsort itself is 0.013 ms).

Shapes: b2, n=36864, c=144 (qkv at ATD-light 192^2).

    python tools/probe_gather.py
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
                y = y * 0.999 + fn(y) * 1e-3
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
    print(f'{label:52s} {per_op * 1e3:8.3f} ms', flush=True)
    return per_op


def main():
    import jax
    import jax.numpy as jnp

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    rng = np.random.default_rng(0)
    b, n, c = 2, 192 * 192, 144
    x = jnp.asarray(rng.standard_normal((b, n, c)) * 0.1, jnp.bfloat16)
    idx = jnp.asarray(np.stack([rng.permutation(n) for _ in range(b)]), jnp.int32)

    def g_take_along(y):
        return jnp.take_along_axis(y, idx[..., None], axis=1)

    def g_advanced(y):
        return y[jnp.arange(b)[:, None], idx]

    def g_vmap_take(y):
        return jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(y, idx)

    def g_onehot_seg(y):
        # gather via 128-row blocked one-hot matmuls is O(n^2/128) flops — skip
        return y

    def s_scatter(y):
        return jnp.zeros_like(y).at[jnp.arange(b)[:, None], idx].set(y)

    def s_gather_inverse(y):
        inv = jnp.argsort(idx, axis=-1)
        return jnp.take_along_axis(y, inv[..., None], axis=1)

    ya = np.asarray(g_take_along(x), np.float32)
    for f, name in [(g_advanced, 'advanced-index'), (g_vmap_take, 'vmap take')]:
        yb = np.asarray(f(x), np.float32)
        assert np.array_equal(ya, yb), name
    sa = np.asarray(s_scatter(x), np.float32)
    sb = np.asarray(s_gather_inverse(x), np.float32)
    assert np.array_equal(sa, sb)

    def s_int_inverse(y):
        # inverse permutation via a cheap (b, n) int32 scatter, then gather
        inv = jnp.zeros_like(idx).at[jnp.arange(b)[:, None], idx].set(
            jnp.broadcast_to(jnp.arange(n, dtype=idx.dtype), (b, n)))
        return jnp.take_along_axis(y, inv[..., None], axis=1)

    sc = np.asarray(s_int_inverse(x), np.float32)
    assert np.array_equal(sa, sc)

    bench(g_take_along, x, 'gather: take_along_axis (current)')
    bench(g_advanced, x, 'gather: advanced indexing')
    bench(g_vmap_take, x, 'gather: vmap(jnp.take)')
    bench(s_scatter, x, 'unsort: scatter .at[].set (current)')
    bench(s_gather_inverse, x, 'unsort: argsort-inverse + gather')
    bench(s_int_inverse, x, 'unsort: int-scatter-inverse + gather')

    # padded-lane variants: gather rows at 128/256-lane multiples
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 256 - c)))
    bench(lambda y: jnp.take_along_axis(jnp.pad(y, ((0, 0), (0, 0), (0, 256 - c))),
                                        idx[..., None], axis=1)[..., :c],
          x, 'gather: pad lanes to 256 first')
    del xp

    # f32 vs bf16 row width (latency- vs bandwidth-bound discriminator)
    xf = x.astype(jnp.float32)
    bench(lambda y: jnp.take_along_axis(y, idx[..., None], axis=1), xf, 'gather: f32 rows (2x bytes)')
    del xf

    # narrow rows: gather x (c=48) instead of qkv (3c=144), then project.
    # If gather is bandwidth-ish, this is the AC_MSA rewrite (sort commutes
    # with the rowwise qkv projection).
    cn = 48
    xn = x[..., :cn]
    w3 = jnp.asarray(rng.standard_normal((3 * cn, cn)) * 0.05, x.dtype)
    bench(lambda y: jnp.take_along_axis(y, idx[..., None], axis=1), xn, 'gather: narrow rows c=48')
    bench(lambda y: (jnp.take_along_axis(y, idx[..., None], axis=1) @ w3.T)
          .reshape(b, n, 3, cn).sum(2), xn,
          'gather c=48 + qkv proj (fused rewrite)')

    # lane-dim gather on the transposed layout
    xt = jnp.transpose(x, (0, 2, 1))  # (b, c, n)
    bench(lambda y: jnp.take_along_axis(y, idx[:, None, :], axis=2), xt, 'gather: lane dim (b,c,n)')

    # flattened batch: one (b*n, c) take
    fidx = (idx + (jnp.arange(b) * n)[:, None]).reshape(-1)
    bench(lambda y: jnp.take(y.reshape(b * n, c), fidx, axis=0).reshape(b, n, c), x,
          'gather: flattened (b*n, c) take')

    def g_flat(y):
        off = (jnp.arange(b, dtype=idx.dtype) * n)[:, None]
        return jnp.take(y.reshape(b * n, y.shape[-1]), (idx + off).reshape(-1),
                        axis=0).reshape(b, n, y.shape[-1])

    yd = np.asarray(g_flat(x), np.float32)
    assert np.array_equal(ya, yd)
    bench(g_flat, xn, 'gather: flattened take, c=48')

    def s_flat_inverse(y):
        inv = jnp.zeros_like(idx).at[jnp.arange(b)[:, None], idx].set(
            jnp.broadcast_to(jnp.arange(n, dtype=idx.dtype), (b, n)))
        return g_flat_at(y, inv)

    def g_flat_at(y, i):
        off = (jnp.arange(b, dtype=i.dtype) * n)[:, None]
        return jnp.take(y.reshape(b * n, y.shape[-1]), (i + off).reshape(-1),
                        axis=0).reshape(b, n, y.shape[-1])

    se = np.asarray(s_flat_inverse(x), np.float32)
    assert np.array_equal(sa, se)
    bench(s_flat_inverse, x, 'unsort: int-inverse + flattened take')
    bench(s_flat_inverse, xn, 'unsort: int-inverse + flat take, c=48')
    return 0


if __name__ == '__main__':
    sys.exit(main())
