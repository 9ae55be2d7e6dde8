#!/usr/bin/env python
"""Per-shape and per-chain throughput of ESRGAN's conv menu under XLA.

tools/peak_conv.py showed the chip delivers ~164 TFLOP/s useful on 128ch
3x3 convs (83% of the 197 v5e spec) but only 62 on 64ch — so the 64-TFLOP
"padded-MXU roofline" story in BENCHMARKS.md was a measurement artifact,
and ESRGAN's 34 useful TFLOP/s may have real headroom.  This times every
RDB dense-layer shape (64/96/128/160->32, 192->64) plus the whole RDB and
RRDB chains, bf16 batch 16 @256^2, amortized >=4 convs per loop iteration.

All operands generated on device (tunnel host->device is minutes/100MB).
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


B, H = 16, 256
PX = B * H * H


def main():
    import jax
    import jax.numpy as jnp

    print('backend:', jax.default_backend(), jax.devices()[0], flush=True)
    bf = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def dev_normal(shape, scale=0.05):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(bf)

    def conv(x, w):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ('NHWC', 'HWIO', 'NHWC'))
        return jax.lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                            dimension_numbers=dn,
                                            preferred_element_type=bf)

    def lrelu(x):
        return jnp.where(x >= 0, x, x * jnp.asarray(0.2, bf))

    # ---- (a) each dense-layer shape standalone, 4 chained convs/iter ----
    # chain trick: conv cin->cout, then project back cout->cin with a 1x1
    # so the loop carries a cin tensor; count only the 3x3 flops but also
    # report with the 1x1 flops included for honesty.
    for cin, cout in ((64, 32), (96, 32), (128, 32), (160, 32), (192, 64),
                     (64, 64), (128, 128)):
        def mk(cin=cin, cout=cout):
            def f():
                x = dev_normal((B, H, H, cin), 0.1)
                w = dev_normal((3, 3, cin, cout))
                p = dev_normal((1, 1, cout, cin))
                return (x, x, w, p)
            return f

        def body(_, carry, cin=cin, cout=cout):
            y, x0, w, p = carry
            z = y
            for _ in range(4):
                z = conv(lrelu(conv(z, w)), p)
            return (z * jnp.asarray(1e-2, bf) + x0, x0, w, p)

        f3 = 4 * 2 * 9 * cin * cout * PX
        f1 = 4 * 2 * cin * cout * PX
        t = bench_loop(body, mk(), f3 + f1,
                       f'conv3x3 {cin}->{cout} +1x1 back b{B} 256^2 bf16')
        if t == t:
            print(f'{"":52s}   (3x3-only share: {f3 / (f3 + f1) * 100:.0f}%)',
                  flush=True)

    # ---- (b) whole RDB chain: 5 convs + concat + lrelu + residual ----
    GC, NF = 32, 64

    def mk_rdb():
        def f():
            x = dev_normal((B, H, H, NF), 0.1)
            ws = tuple(dev_normal((3, 3, NF + i * GC, GC if i < 4 else NF))
                       for i in range(5))
            return (x, x) + ws
        return f

    def rdb(x, ws):
        feats = [x]
        for i in range(4):
            z = lrelu(conv(jnp.concatenate(feats, -1), ws[i]))
            feats.append(z)
        out = conv(jnp.concatenate(feats, -1), ws[4])
        return out * jnp.asarray(0.2, bf) + x

    def body_rdb(_, carry):
        y, x0 = carry[0], carry[1]
        ws = carry[2:]
        z = rdb(y, ws)
        return (z, x0) + ws

    rdb_flop = 2 * 9 * PX * (64 * 32 + 96 * 32 + 128 * 32 + 160 * 32 + 192 * 64)
    bench_loop(body_rdb, mk_rdb(), rdb_flop, f'RDB chain (5 convs) b{B} 256^2 bf16')

    # ---- (c) RDB with inputs pre-padded to 192ch (zero-extended weights):
    # one fixed conv shape 192->32; does XLA like uniform shapes better? ----
    def mk_rdb_pad():
        def f():
            x = dev_normal((B, H, H, NF), 0.1)
            ws = tuple(dev_normal((3, 3, 192, GC if i < 4 else NF))
                       for i in range(5))
            return (x, x) + ws
        return f

    def rdb_pad(x, ws):
        z = jnp.concatenate([x, jnp.zeros((B, H, H, 128), bf)], -1)
        feats = z
        for i in range(4):
            f = lrelu(conv(feats, ws[i]))
            feats = jax.lax.dynamic_update_slice(feats, f, (0, 0, 0, NF + i * GC))
        out = conv(feats, ws[4])
        return out * jnp.asarray(0.2, bf) + x

    def body_rdb_pad(_, carry):
        y, x0 = carry[0], carry[1]
        ws = carry[2:]
        z = rdb_pad(y, ws)
        return (z, x0) + ws

    pad_flop = 2 * 9 * PX * 192 * (32 * 4 + 64)
    bench_loop(body_rdb_pad, mk_rdb_pad(), pad_flop,
               f'RDB padded-192 (5x 192->*) b{B} 256^2 bf16 (padded-op flops)')


if __name__ == '__main__':
    main()
