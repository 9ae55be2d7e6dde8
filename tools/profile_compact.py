#!/usr/bin/env python
"""Compact (SRVGGNetCompact) anatomy: why 29.4 TFLOP/s bf16 when the 64ch
3x3 conv ceiling at this batch is ~39-49 useful?

    python tools/profile_compact.py [--tile 256] [--batch 8]

Measures: one body conv+PReLU, the 16-conv body chain (amortization +
fusion check), head conv (3->64), tail conv (64->48) + pixel_shuffle, the
nearest-resid add, and the whole model — bf16, calibrated loops.
Reference forward: resselt/archs/compact/arch.py:48-64.
"""

from __future__ import annotations

import argparse
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
    print(f'{label:40s} {per_op * 1e3:8.3f} ms', flush=True)
    return per_op


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--tile', type=int, default=256)
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.nn import functional as F
    from resselt_tpu.zoo import make_compact

    rng = np.random.default_rng(0)
    b, t = args.batch, args.tile
    dt = jnp.bfloat16
    sd = make_compact(num_feat=64, num_conv=16, upscale=4)
    model = resselt_tpu.load_from_state_dict(sd)
    params = {k: jnp.asarray(v).astype(dt) if str(np.asarray(v).dtype) == 'float32' else jnp.asarray(v)
              for k, v in model.params.items()}

    x64 = jnp.asarray(rng.random((b, t, t, 64), np.float32)).astype(dt)
    x3 = jnp.asarray(rng.random((b, t, t, 3), np.float32)).astype(dt)

    w_body = params['body.2.weight']
    b_body = params['body.2.bias']
    a_body = params['body.3.weight']  # PReLU slope

    def prelu(y, a):
        return jnp.where(y >= 0, y, a * y)

    def one_conv(v):
        return prelu(F.conv2d(v, w_body, b_body, padding=1), a_body)

    per1 = bench(one_conv, x64, 'body conv+PReLU x4/iter', reps=4)

    def chain16(v):
        for i in range(16):
            w = params[f'body.{2 * i + 2}.weight']
            bb = params[f'body.{2 * i + 2}.bias']
            a = params[f'body.{2 * i + 3}.weight']
            v = prelu(F.conv2d(v, w, bb, padding=1), a)
        return v

    per16 = bench(chain16, x64, 'body chain (16 conv+PReLU)', reps=1)

    def conv_noact(v):
        return F.conv2d(v, w_body, b_body, padding=1)

    bench(conv_noact, x64, 'body conv NO act x4/iter', reps=4)

    def head(v):
        return prelu(F.conv2d(v, params['body.0.weight'], params['body.0.bias'], padding=1),
                     params['body.1.weight'])[..., :3]

    bench(head, x3, 'head conv 3->64 (crop back)', reps=4)

    wt = params['body.34.weight']
    bt = params['body.34.bias']

    def tail(v):
        y = F.conv2d(v, wt, bt, padding=1)
        y = F.pixel_shuffle(y, 4)
        return v + jnp.mean(y).astype(v.dtype)  # scalar carry dependency

    bench(tail, x64, 'tail conv 64->48 + PS4 (crop)', reps=4)

    def resid(v):
        y = F.interpolate_nearest(v, scale_factor=4)
        return v + jnp.mean(y).astype(v.dtype)

    bench(resid, x3, 'nearest x4 resid (reduced)', reps=4)

    import functools
    apply_fn = functools.partial(model._apply_fn, model.config)

    def whole(v):
        return apply_fn(params, v)[:, :t, :t, :]

    per_m = bench(whole, x3, 'WHOLE model (crop)', reps=1)

    gflop_conv = 2 * 64 * 64 * 9 * b * t * t / 1e9
    print(f'\nper-conv useful: {gflop_conv / per1:.1f} GFLOP/s standalone, '
          f'{16 * gflop_conv / per16 / 1e3:.1f} TFLOP/s in-chain')
    print(f'whole model: {per_m * 1e3:.2f} ms; body chain share {per16 / per_m * 100:.0f}%')


if __name__ == '__main__':
    main()
