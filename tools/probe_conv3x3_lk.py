#!/usr/bin/env python
"""fused_conv_lk at k=3/5 on the 64ch conv stable vs XLA, on the live chip.

CLAUDE.md round-3 note: XLA pads conv cin AND cout to 128 lanes, so the
64ch 3x3 conv (compact/RCAN/mosr bodies, reference compact/arch.py,
rcan/arch.py) runs ~49 TFLOP/s useful of the 164 the chip delivers — a
dense-packed kernel has up to 2x headroom (pack2 ratio 0.5 useful vs
XLA's 0.25).  fused_conv_lk's DMA-assembled group-shift pattern already
generalizes to k=3 (p = 128/cin = 2); this probe measures it amortized
>=4 convs/iteration (loop-overhead rule, CLAUDE.md).

Run: JAX_PLATFORMS=axon python tools/probe_conv3x3_lk.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

B, H = 8, 256
PX = B * H * H


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
        print(f'{label:56s} FAILED: {type(e).__name__}: {str(e)[:110]}', flush=True)
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
    print(f'{label:56s} {per_iter * 1e3:9.3f} ms/iter  {tflops:7.1f} TFLOP/s useful', flush=True)
    return per_iter


def main():
    import jax
    import jax.numpy as jnp

    from resselt_tpu.ops.fused_conv import fused_conv_lk

    print('devices:', jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    for cin, cout, k, dt in [
        (64, 64, 3, jnp.float32),
        (64, 64, 3, jnp.bfloat16),
        (32, 32, 3, jnp.float32),
        (64, 64, 5, jnp.float32),
    ]:
        wt = jax.random.normal(key, (cout, cin, k, k), jnp.float32) * 0.05
        bias = jax.random.normal(key, (cout,), jnp.float32)
        # 4 convs per iteration: useful flops = 4 * PX * 2 * k*k*cin*cout
        flops = 4 * PX * 2 * k * k * cin * cout

        def make_x(cin=cin, dt=dt):
            return jax.random.normal(key, (B, H, H, cin), dt)

        def xla_body(_, x, wt=wt, bias=bias, k=k, dt=dt):
            w_ = wt.astype(dt)
            for _i in range(4):
                y = jax.lax.conv_general_dilated(
                    x, w_, (1, 1), [(k // 2, k // 2)] * 2,
                    dimension_numbers=('NHWC', 'OIHW', 'NHWC'),
                    preferred_element_type=jnp.float32,
                )
                x = jnp.where(y >= 0, y, 0.2 * y).astype(dt)
            return x

        def lk_body(_, x, wt=wt, bias=bias, k=k, dt=dt):
            for _i in range(4):
                x = fused_conv_lk(x, wt, bias, k=k, act='lrelu').astype(dt)
            return x

        tag = f'{cin}->{cout} k={k} {dt.__name__}'
        bench_loop(lambda i, x: xla_body(i, x), make_x, flops, f'XLA conv+lrelu {tag}')
        bench_loop(lambda i, x: lk_body(i, x), make_x, flops, f'fused_conv_lk  {tag}')


if __name__ == '__main__':
    main()
