#!/usr/bin/env python
"""Does the v5e run int8 convs/matmuls at ~2x bf16 through XLA?

If yes, an opt-in quantized serving mode (per-channel int8 weights,
dynamic int8 activations, f32 accumulate) could lift MXU-bound rows up
to 2x.  This probes raw op rates at ESRGAN/producer-RDB shapes before
any quantization work is invested.

    python tools/probe_int8.py
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
                y = fn(y)
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

    # --- batched matmul: (4096, 4096) @ (4096, 4096) x4 chained ---
    m = 4096
    a8 = jnp.asarray(rng.integers(-127, 127, (m, m)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (m, m)), jnp.int8)
    abf = a8.astype(jnp.bfloat16)
    wbf = w8.astype(jnp.bfloat16)

    def mm_bf16(y):
        return jnp.tanh(y @ wbf * 1e-4)

    t_bf = bench(mm_bf16, abf, f'{m}^3 matmul bf16')
    gflop = 2 * m**3 / 1e9
    print(f'  -> {gflop / t_bf / 1e3:.1f} TFLOP/s')

    def mm_int8(y):
        acc = jax.lax.dot_general(y, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        # requantize to int8 so the chain stays int8-in
        return (acc >> 12).astype(jnp.int8)

    t_i8 = bench(mm_int8, a8, f'{m}^3 matmul int8 (s8xs8->s32, requant)')
    print(f'  -> {gflop / t_i8 / 1e3:.1f} TOP/s  ({t_bf / t_i8:.2f}x vs bf16)')

    # --- conv shapes: 128ch 3x3 (peak probe shape) and ESRGAN producer 64->192 ---
    for (cin, cout, hw, b) in [(128, 128, 256, 8), (64, 192, 256, 16)]:
        x8 = jnp.asarray(rng.integers(-127, 127, (b, hw, hw, cin)), jnp.int8)
        k8 = jnp.asarray(rng.integers(-127, 127, (cout, cin, 3, 3)), jnp.int8)
        xbf = x8.astype(jnp.bfloat16)
        kbf = k8.astype(jnp.bfloat16)
        gflop = 2 * 9 * cin * cout * b * hw * hw / 1e9

        def conv_bf16(y, kbf=kbf, cin=cin, cout=cout):
            z = jax.lax.conv_general_dilated(
                y, kbf, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'OIHW', 'NHWC'))
            return jnp.tanh(z * 1e-5)[..., :cin] if cout != cin else jnp.tanh(z * 1e-5)

        t_bf = bench(conv_bf16, xbf, f'conv3x3 {cin}->{cout} {hw}^2 b{b} bf16')
        print(f'  -> {gflop / t_bf / 1e3:.1f} TFLOP/s')

        def conv_int8(y, k8=k8, cin=cin, cout=cout):
            z = jax.lax.conv_general_dilated(
                y, k8, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'OIHW', 'NHWC'),
                preferred_element_type=jnp.int32)
            z = (z >> 10).astype(jnp.int8)
            return z[..., :cin] if cout != cin else z

        t_i8 = bench(conv_int8, x8, f'conv3x3 {cin}->{cout} {hw}^2 b{b} int8')
        print(f'  -> {gflop / t_i8 / 1e3:.1f} TOP/s  ({t_bf / t_i8:.2f}x vs bf16)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
