#!/usr/bin/env python
"""1x1 conv formulations at small channel counts on the live chip.

Small-C 1x1 convs (PLKSR mixer, EIMN, span-class attention stems) measure
far below both the MXU roofline and HBM bandwidth under XLA's conv path
(EIMN anatomy: 1.35 ms for 64->64 @256^2 b8 f32 = 3.2 useful TFLOP/s,
200 GB/s).  Since a 1x1 conv has no spatial shifts, s = 128/C adjacent
pixels can be packed into the 128 lanes with a PURE RESHAPE and the op
becomes a plain (M/s, 128) @ (128, 128) dot with block-diagonal weights —
s times less padded MXU work, zero relayout.  This times:
  - conv_general_dilated 1x1
  - flat (M, C) @ (C, C) dot
  - pixel-packed block-diag (M/s, 128) @ (128, 128) dot
at C in {64, 32}, f32 + bf16, amortized 4 ops/iteration.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

from tools.probe_conv3x3_lk import bench_loop  # noqa: E402

B, H = 8, 256
PX = B * H * H


def main():
    import jax
    import jax.numpy as jnp

    print('devices:', jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    for c, dt in [(64, jnp.float32), (64, jnp.bfloat16), (32, jnp.float32), (32, jnp.bfloat16)]:
        s = 128 // c
        wt = (jax.random.normal(key, (c, c), jnp.float32) * 0.05).astype(dt)
        flops = 4 * PX * 2 * c * c

        # block-diag packed weights (s*c, s*c)
        wbd = jnp.zeros((s * c, s * c), dt)
        for i in range(s):
            wbd = wbd.at[i * c : (i + 1) * c, i * c : (i + 1) * c].set(wt)

        def make_x(c=c, dt=dt):
            return jax.random.normal(key, (B, H, H, c), dt)

        def conv_body(_, x, wt=wt, dt=dt):
            w4 = wt.reshape(c, c, 1, 1).transpose(0, 1, 2, 3)
            w_oihw = wt.reshape(c, c)[:, :, None, None]
            for _i in range(4):
                y = jax.lax.conv_general_dilated(
                    x, w_oihw, (1, 1), 'VALID',
                    dimension_numbers=('NHWC', 'OIHW', 'NHWC'),
                    preferred_element_type=jnp.float32,
                )
                x = jnp.maximum(y, 0.0).astype(dt)
            return x

        def dot_body(_, x, wt=wt, dt=dt):
            for _i in range(4):
                y = jax.lax.dot_general(
                    x.reshape(-1, c), wt.T, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                x = jnp.maximum(y, 0.0).astype(dt).reshape(x.shape)
            return x

        def packed_body(_, x, wbd=wbd, dt=dt, s=s, c=c):
            xp = x.reshape(-1, s * c)
            for _i in range(4):
                y = jax.lax.dot_general(
                    xp, wbd.T, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                xp = jnp.maximum(y, 0.0).astype(dt)
            return xp.reshape(x.shape)

        tag = f'{c}->{c} {dt.__name__}'
        bench_loop(conv_body, make_x, flops, f'conv1x1+relu        {tag}')
        bench_loop(dot_body, make_x, flops, f'flat dot+relu       {tag}')
        bench_loop(packed_body, make_x, flops, f'pixel-packed dot    {tag}')


if __name__ == '__main__':
    main()
