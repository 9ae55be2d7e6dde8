#!/usr/bin/env python
"""Can a transposed (channels-in-sublanes) formulation beat XLA's 4x
output-lane padding on cout=32 convs?

probe_esrgan_shapes.py showed XLA's NHWC 64->32 conv delivers 18 useful
TFLOP/s (~73 padded = N padded 32->128).  Any spatial-into-lane repacking
keeps M*K_pad*N_pad invariant, so the only dense formulation is the
transposed one: y(32, M) = W(32, 576) @ im2col(576, M) — both operands
dense, output rows 32 live in SUBLANES (granularity 8) instead of lanes
(granularity 128).  This measures whether the MXU sustains small-row
outputs, plus XLA's NCHW conv lowering and an explicit 9-shifted-dot
transposed conv.

Operands on-device; per-array <= ~160MB (tunnel remote-compile 413s on
bigger carries).
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
        print(f'{label:52s} FAILED: {type(e).__name__}: {str(e)[:110]}',
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
    print(f'{label:52s} {per_iter * 1e3:9.3f} ms/iter  {tflops:7.1f} TFLOP/s',
          flush=True)
    return tflops


def main():
    import jax
    import jax.numpy as jnp

    print('backend:', jax.default_backend(), jax.devices()[0], flush=True)
    bf = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def dev_normal(shape, scale=0.05):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(bf)

    M, K = 131072, 576

    # ---- dot orientation sweep: y = W(R,K)@x(K,M), project back ----
    for R in (8, 32, 64, 128):
        def mk(R=R):
            def f():
                x = dev_normal((K, M), 0.1)
                w = dev_normal((R, K))
                p = dev_normal((K, R))
                return (x, x, w, p)
            return f

        def body(_, carry, R=R):
            y, x0, w, p = carry
            z = y
            for _ in range(4):
                z = jnp.matmul(p, jnp.matmul(w, z))
            return (z * jnp.asarray(1e-2, bf) + x0, x0, w, p)

        flop = 4 * 2 * 2 * R * K * M
        bench_loop(body, mk(), flop, f'transposed dot ({R},{K})@({K},{M}) bf16')

    # baseline orientation: (M,K)@(K,32)
    def mk_std():
        def f():
            x = dev_normal((M, K), 0.1)
            w = dev_normal((K, 32))
            p = dev_normal((32, K))
            return (x, x, w, p)
        return f

    def body_std(_, carry):
        y, x0, w, p = carry
        z = y
        for _ in range(4):
            z = jnp.matmul(jnp.matmul(z, w), p)
        return (z * jnp.asarray(1e-2, bf) + x0, x0, w, p)

    bench_loop(body_std, mk_std(), 4 * 2 * 2 * 32 * K * M,
               f'standard dot ({M},{K})@({K},32) bf16')

    # ---- NCHW conv lowering: does XLA do better channels-first? ----
    B, H = 16, 256
    for cin, cout in ((64, 32), (192, 64), (64, 64)):
        def mk_nchw(cin=cin, cout=cout):
            def f():
                x = dev_normal((B, cin, H, H), 0.1)
                w = dev_normal((cout, cin, 3, 3))
                p = dev_normal((cin, cout, 1, 1))
                return (x, x, w, p)
            return f

        def body_nchw(_, carry, cin=cin, cout=cout):
            y, x0, w, p = carry
            dn = jax.lax.conv_dimension_numbers(y.shape, w.shape, ('NCHW', 'OIHW', 'NCHW'))
            z = y
            for _ in range(4):
                z2 = jax.lax.conv_general_dilated(z, w, (1, 1), 'SAME',
                                                  dimension_numbers=dn,
                                                  preferred_element_type=bf)
                dn1 = jax.lax.conv_dimension_numbers(z2.shape, p.shape, ('NCHW', 'OIHW', 'NCHW'))
                z = jax.lax.conv_general_dilated(z2, p, (1, 1), 'SAME',
                                                 dimension_numbers=dn1,
                                                 preferred_element_type=bf)
            return (z * jnp.asarray(1e-2, bf) + x0, x0, w, p)

        flop = 4 * 2 * (9 + 1) * cin * cout * B * H * H
        bench_loop(body_nchw, mk_nchw(), flop,
                   f'NCHW conv3x3 {cin}->{cout} +1x1 b{B} 256^2 bf16')

    # ---- explicit 9-shifted-dot transposed conv 64->32 ----
    # x kept (cin, B*H, W); tap (a,b) = dot over cin of W_ab(32,64) with
    # x shifted by (a-1, b-1); shifts via slice+pad (XLA fuses into the dot
    # operand or not — that is what we are measuring).
    cin, cout = 64, 32

    def mk_sh():
        def f():
            x = dev_normal((cin, B * H, H), 0.1)
            w = dev_normal((9, cout, cin))
            p = dev_normal((cin, cout))
            return (x, x, w, p)
        return f

    def shift2d(x, da, db):
        # roll with zero fill on the (row, col) trailing dims
        z = jnp.roll(x, (da, db), axis=(1, 2))
        return z

    def body_sh(_, carry):
        y, x0, w, p = carry
        z = y
        for _ in range(2):
            acc = jnp.zeros((cout, B * H, H), bf)
            for a in range(3):
                for b in range(3):
                    xs = shift2d(z, 1 - a, 1 - b)
                    acc = acc + jnp.einsum('oc,chw->ohw', w[3 * a + b], xs,
                                           preferred_element_type=bf)
            z = jnp.einsum('co,ohw->chw', p, acc, preferred_element_type=bf)
        return (z * jnp.asarray(1e-2, bf) + x0, x0, w, p)

    flop = 2 * 2 * (9 + 1) * cin * cout * B * H * H
    bench_loop(body_sh, mk_sh(), flop,
               f'9-shift transposed conv {cin}->{cout} b{B} 256^2 bf16')


if __name__ == '__main__':
    main()
