#!/usr/bin/env python
"""Producer-decomposed RDB: cut ESRGAN's cout=32 lane-padding 2.2x in pure XLA.

The MXU pads conv output channels to 128 lanes in every orientation
(tools/probe_transposed.py), but the contraction dim K never lane-pads.
ESRGAN's RDB computes c_i = conv(concat(x, f_1..f_{i-1}) -> 32) — five
convs whose N=32/64 pad 4x/2x: padded work 9*128*(64+96+128+160+192) =
737k units.  Distributing each conv over input slices and regrouping by
PRODUCER (each producer emits one wide conv to all its later consumers)
gives stages x->192, f1->160, f2->128, f3->96, f4->64 with padded work
9*(64*256 + 32*256 + 32*128*3) = 331k units — 2.22x less, numerically
identical math modulo fp summation order.

  A = conv(x, Wx)            # (..., 192) = contributions of x to c1..c5
  f1 = lrelu(A[..., :32]); A = A[..., 32:] + conv(f1, W1)   # (..., 160)
  ...
  out = A * 0.2 + x          # A is c5 (64ch) at the end

This times the classic chain vs the producer form, bf16 and f32, b16 256².
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
    except Exception as e:  # noqa: BLE001
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
    return per_iter


B, H, NF, GC = 16, 256, 64, 32
PX = B * H * H
RDB_FLOP = 2 * 9 * PX * (64 * 32 + 96 * 32 + 128 * 32 + 160 * 32 + 192 * 64)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print('backend:', jax.default_backend(), jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)

    for dtype_name in ('bf16', 'f32'):
        dt = jnp.bfloat16 if dtype_name == 'bf16' else jnp.float32

        def dev_normal(shape, scale=0.05):
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dt)

        def conv(x, w):
            dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ('NHWC', 'HWIO', 'NHWC'))
            return jax.lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                                dimension_numbers=dn,
                                                preferred_element_type=dt)

        def lrelu(x):
            return jnp.where(x >= 0, x, x * jnp.asarray(0.2, dt))

        # classic weights: W_i is (3,3, 64+32*(i-1) -> 32 or 64)
        def mk_classic():
            def f():
                x = dev_normal((B, H, H, NF), 0.1)
                ws = tuple(dev_normal((3, 3, NF + i * GC, GC if i < 4 else NF))
                           for i in range(5))
                return (x, x) + ws
            return f

        def rdb_classic(x, ws):
            feats = [x]
            for i in range(4):
                z = lrelu(conv(jnp.concatenate(feats, -1), ws[i]))
                feats.append(z)
            out = conv(jnp.concatenate(feats, -1), ws[4])
            return out * jnp.asarray(0.2, dt) + x

        def body_classic(_, carry):
            y, x0 = carry[0], carry[1]
            ws = carry[2:]
            return (rdb_classic(y, ws), x0) + ws

        bench_loop(body_classic, mk_classic(), RDB_FLOP,
                   f'RDB classic {dtype_name} b{B} 256^2')

        # producer weights: stage j emits to all later consumers.
        # stage0: x(64) -> 192 (c1:32 c2:32 c3:32 c4:32 c5:64)
        # stage j>=1: f_j(32) -> 32*(4-j)+64
        def mk_prod():
            def f():
                x = dev_normal((B, H, H, NF), 0.1)
                w0 = dev_normal((3, 3, NF, 4 * GC + NF))
                w1 = dev_normal((3, 3, GC, 3 * GC + NF))
                w2 = dev_normal((3, 3, GC, 2 * GC + NF))
                w3 = dev_normal((3, 3, GC, GC + NF))
                w4 = dev_normal((3, 3, GC, NF))
                return (x, x, w0, w1, w2, w3, w4)
            return f

        def rdb_prod(x, ws):
            a = conv(x, ws[0])
            for j in range(4):
                f = lrelu(a[..., :GC])
                a = a[..., GC:] + conv(f, ws[1 + j])
            return a * jnp.asarray(0.2, dt) + x

        def body_prod(_, carry):
            y, x0 = carry[0], carry[1]
            ws = carry[2:]
            return (rdb_prod(y, ws), x0) + ws

        bench_loop(body_prod, mk_prod(), RDB_FLOP,
                   f'RDB producer {dtype_name} b{B} 256^2')

    # exactness check (CPU-fast shapes, f32): producer == classic when the
    # producer weights are the resliced classic weights.
    np.random.seed(0)
    Bs, Hs = 2, 32
    x = jnp.asarray(np.random.randn(Bs, Hs, Hs, NF).astype(np.float32) * 0.1)
    ws = [jnp.asarray(np.random.randn(3, 3, NF + i * GC, GC if i < 4 else NF)
                      .astype(np.float32) * 0.05) for i in range(5)]

    def conv32(x, w):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ('NHWC', 'HWIO', 'NHWC'))
        return jax.lax.conv_general_dilated(x, w, (1, 1), 'SAME', dimension_numbers=dn)

    def lrelu32(x):
        return jnp.where(x >= 0, x, 0.2 * x)

    feats = [x]
    for i in range(4):
        feats.append(lrelu32(conv32(jnp.concatenate(feats, -1), ws[i])))
    ref = conv32(jnp.concatenate(feats, -1), ws[4]) * 0.2 + x

    # reslice: producer j's weight = concat over consumers i>j of
    # W_i[:, :, slice_j, :] along O
    def producer_w(j):
        lo = NF + (j - 1) * GC if j > 0 else 0
        hi = lo + (NF if j == 0 else GC)
        return jnp.concatenate([ws[i][:, :, lo:hi, :] for i in range(j, 5)], axis=-1)

    pws = [producer_w(j) for j in range(5)]
    a = conv32(x, pws[0])
    for j in range(4):
        f = lrelu32(a[..., :GC])
        a = a[..., GC:] + conv32(f, pws[1 + j])
    got = a * 0.2 + x
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f'exactness (f32, resliced weights): max abs err {err:.3e}', flush=True)


if __name__ == '__main__':
    main()
