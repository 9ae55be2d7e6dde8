#!/usr/bin/env python
"""Conv-shaped peak probes: what ceiling do ESRGAN-class convs have?

The chip measures ~153 TFLOP/s bf16 on chained batched 4096^3 matmuls
(not the 64 previously documented).  This times (a) a batched 4096^3
matmul, (b) a conv-shaped matmul (M=HW, K=9*cin, N=cout), (c) the actual
XLA conv at ESRGAN body shapes, all with the calibrated-loop methodology.

All operands are generated ON DEVICE (jax.random under jit): host->device
transfers through the axon tunnel are minutes-per-100MB and would dominate.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def bench_loop(body_fn, make_x0, flop_per_iter, label, min_seconds=2.0):
    import jax
    import jax.numpy as jnp

    x0 = jax.jit(make_x0)()
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), x0)

    @jax.jit
    def loop(x, n):
        y = jax.lax.fori_loop(0, n, body_fn, x)
        first = jax.tree_util.tree_leaves(y)[0]
        return jnp.sum(first.reshape(-1)[:64].astype(jnp.float32))

    try:
        float(loop(x0, jnp.int32(2)))
    except Exception as e:  # noqa: BLE001 - probe rows are independent
        print(f'{label:46s} FAILED: {type(e).__name__}: {str(e)[:120]}',
              flush=True)
        return float('nan')
    t0 = time.perf_counter()
    float(loop(x0, jnp.int32(2)))
    dt1 = time.perf_counter() - t0
    n2 = 2 + max(2, int(2 * min_seconds / max(dt1, 1e-3)) + 1)
    t0 = time.perf_counter()
    float(loop(x0, jnp.int32(n2)))
    dt2 = time.perf_counter() - t0
    per_iter = max(dt2 - dt1, 1e-6) / (n2 - 2)
    tflops = flop_per_iter / per_iter / 1e12
    print(f'{label:46s} {per_iter * 1e3:9.3f} ms/iter  {tflops:7.1f} TFLOP/s',
          flush=True)
    return tflops


def main():
    import jax
    import jax.numpy as jnp

    print('backend:', jax.default_backend(), jax.devices()[0], flush=True)
    bf = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def dev_normal(shape, scale):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(bf)

    # (a) batched independent matmuls, dependency across iterations only
    g, m = 4, 4096

    def mk_batch():
        a = dev_normal((g, m, m), 0.01)
        b = dev_normal((g, m, m), 0.01)
        return (a, a, b)

    def body_batch(_, carry):
        y, aa, bb = carry
        z = jnp.matmul(y, bb)
        return (z * jnp.asarray(1e-3, bf) + aa, aa, bb)

    bench_loop(body_batch, mk_batch, 2 * g * m * m * m, f'batch{g} {m}^3 bf16')

    # (b) conv-shaped matmul: M=B*H*W, K=9*64, N=128 (two chained dots)
    # M capped at 2*256^2: the 8*256^2 variant blew the tunnel's
    # remote-compile request-size limit (HTTP 413).
    M, K, N = 2 * 256 * 256, 576, 128

    def mk_cm():
        am = dev_normal((M, K), 0.01)
        bm = dev_normal((K, N), 0.01)
        proj = dev_normal((N, K), 0.01)
        return (am, am, bm, proj)

    def body_cm(_, carry):
        y, am, bm, proj = carry
        z = jnp.matmul(y, bm)          # (M,K)@(K,N)
        y2 = jnp.matmul(z, proj) * jnp.asarray(1e-3, bf) + am
        return (y2, am, bm, proj)

    bench_loop(body_cm, mk_cm, 2 * M * K * N + 2 * M * N * K,
               f'conv-shaped mm M={M} K={K} N={N} bf16')

    # (c) the actual conv: 3x3 64->64 @ 256^2 b8 NHWC bf16
    def mk_conv(c):
        def f():
            x = dev_normal((8, 256, 256, c), 0.1)
            w = dev_normal((3, 3, c, c), 0.05)
            return (x, x, w)
        return f

    def body_conv(_, carry):
        y, x0, w = carry
        dn = jax.lax.conv_dimension_numbers(y.shape, w.shape, ('NHWC', 'HWIO', 'NHWC'))
        z = y
        for _ in range(4):
            z = jax.lax.conv_general_dilated(z, w, (1, 1), 'SAME',
                                             dimension_numbers=dn,
                                             preferred_element_type=bf)
        return (z * jnp.asarray(1e-3, bf) + x0, x0, w)

    for c in (64, 128):
        flop = 4 * 2 * 9 * c * c * 8 * 256 * 256
        bench_loop(body_conv, mk_conv(c), flop,
                   f'xla conv3x3 {c}ch 256^2 b8 bf16 (useful)')

    # (d) f32 comparison points: matmul peak and the 64ch conv
    def mk_batch_f32():
        a = jax.random.normal(key, (g, m, m), jnp.float32) * 0.01
        b = jax.random.normal(key, (g, m, m), jnp.float32) * 0.01
        return (a, a, b)

    def body_batch_f32(_, carry):
        y, aa, bb = carry
        z = jnp.matmul(y, bb)
        return (z * 1e-3 + aa, aa, bb)

    bench_loop(body_batch_f32, mk_batch_f32, 2 * g * m * m * m,
               f'batch{g} {m}^3 f32')


if __name__ == '__main__':
    main()
