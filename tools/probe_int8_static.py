#!/usr/bin/env python
"""Static-scale int8 conv chains: does removing the dynamic amax (leaving
round/clip/cast to fuse into the previous conv's epilogue) recover the
int8 MXU gain for ESRGAN-shaped conv chains?

bench_int8.py measured dynamic-quant int8 at 0.67x bf16 on ESRGAN — the
per-conv amax reduction re-reads every activation.  Here: chain of 8
convs (64->64, 3x3, lrelu) at 256^2 b16, three variants:
  bf16 | int8 dynamic scale | int8 static scale (traced constant).

    python tools/probe_int8_static.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def bench(fn, x, label, reps=2, min_seconds=1.5):
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
    print(f'{label:46s} {per_op * 1e3:8.3f} ms/chain', flush=True)
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
    nconv, c, hw, b = 8, 64, 256, 16
    wf = [jnp.asarray(rng.standard_normal((c, c, 3, 3)) * 0.04, jnp.float32) for _ in range(nconv)]
    w8 = [jnp.asarray(np.clip(np.round(np.asarray(w) / (np.abs(np.asarray(w)).max(axis=(1, 2, 3), keepdims=True) / 127)), -127, 127).astype(np.int8)) for w in wf]
    ws = [jnp.asarray((np.abs(np.asarray(w)).max(axis=(1, 2, 3)) / 127).astype(np.float32)) for w in wf]
    xbf = jnp.asarray(rng.standard_normal((b, hw, hw, c)) * 0.1, jnp.bfloat16)

    def conv(y, w):
        return jax.lax.conv_general_dilated(
            y, w.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'OIHW', 'NHWC'))

    def chain_bf16(y):
        for w in wf:
            z = conv(y, w)
            y = jnp.where(z >= 0, z, 0.2 * z)
        return y

    def conv8(yq, i):
        return jax.lax.conv_general_dilated(
            yq, w8[i], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'OIHW', 'NHWC'),
            preferred_element_type=jnp.int32)

    def chain_dyn(y):
        for i in range(nconv):
            yf = y.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(yf)), 1e-12) / 127.0
            yq = jnp.clip(jnp.round(yf / s), -127, 127).astype(jnp.int8)
            z = conv8(yq, i).astype(jnp.float32) * (ws[i] * s)
            z = jnp.where(z >= 0, z, 0.2 * z)
            y = z.astype(jnp.bfloat16)
        return y

    SA = 0.02  # static activation scale (calibration constant)

    def chain_static(y):
        for i in range(nconv):
            yq = jnp.clip(jnp.round(y.astype(jnp.float32) / SA), -127, 127).astype(jnp.int8)
            z = conv8(yq, i).astype(jnp.float32) * (ws[i] * SA)
            z = jnp.where(z >= 0, z, 0.2 * z)
            y = z.astype(jnp.bfloat16)
        return y

    def chain_static_i8resident(y):
        """Quantize once; each conv's epilogue re-quantizes to int8 so the
        activation stays int8 through the chain (scale folded statically)."""
        yq = jnp.clip(jnp.round(y.astype(jnp.float32) / SA), -127, 127).astype(jnp.int8)
        for i in range(nconv):
            z = conv8(yq, i).astype(jnp.float32) * (ws[i] * SA)
            z = jnp.where(z >= 0, z, 0.2 * z)
            yq = jnp.clip(jnp.round(z / SA), -127, 127).astype(jnp.int8)
        return yq.astype(jnp.bfloat16) * SA

    gflop = 2 * 9 * c * c * b * hw * hw * nconv / 1e9
    t = bench(chain_bf16, xbf, f'bf16 chain x{nconv} 64ch 256^2 b{b}')
    print(f'  -> {gflop / t / 1e3:.1f} TFLOP/s')
    t = bench(chain_dyn, xbf, 'int8 dynamic per-conv scale')
    print(f'  -> {gflop / t / 1e3:.1f} TOP/s')
    t = bench(chain_static, xbf, 'int8 static scale')
    print(f'  -> {gflop / t / 1e3:.1f} TOP/s')
    t = bench(chain_static_i8resident, xbf, 'int8 static, int8-resident chain')
    print(f'  -> {gflop / t / 1e3:.1f} TOP/s')
    return 0


if __name__ == '__main__':
    sys.exit(main())
