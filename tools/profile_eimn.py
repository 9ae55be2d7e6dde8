#!/usr/bin/env python
"""EIMN block anatomy on the TPU: which op class eats the 84 ms/block.

    python tools/profile_eimn.py [--tile 256] [--batch 8]

Round-2 ablation blamed HBM bandwidth, but the arithmetic doesn't close:
10 passes over the 134 MB activation set at 819 GB/s is ~1.6 ms/block,
measured is ~84 ms/block (b8 256^2).  Prime suspects are the depthwise
convs (XLA TPU lowers feature_group_count convs poorly), especially the
dilated 7x7s and the 340-channel SAL.  This measures isolated op chains
with the calibrated-loop methodology (amortized 4 ops/iteration).
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
    print(f'{label:34s} {per_op * 1e3:8.3f} ms')
    return per_op


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--tile', type=int, default=256)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--dim', type=int, default=64)
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax.numpy as jnp

    from resselt_tpu.nn import functional as F

    d = args.dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, args.tile, args.tile, d), np.float32) * 0.1)
    hidden = int(d * 2.66)

    def w(o, i, k):
        return jnp.asarray(rng.standard_normal((o, i, k, k), np.float32) * 0.05)

    w11 = w(d, d, 1)
    w_reg = w(d, 1, 5)          # 5x5 dw, groups=d
    c1, c2 = int(3 / 8 * d), int(1 / 8 * d)
    w_sp1 = w(c1, 1, 5)         # 5x5 dw dilation 2
    w_sp2 = w(d - c1 - c2, 1, 7)  # 7x7 dw dilation 3
    w_in = w(2 * hidden, d, 1)
    w_sal = w(2 * hidden, 1, 3)  # 3x3 dw at 340 ch
    w_out = w(d, hidden, 1)

    print(f'shapes: ({args.batch},{args.tile},{args.tile},{d}), hidden={hidden}')
    bench(lambda t: F.conv2d(t, w11), x, '1x1 conv d->d')
    bench(lambda t: F.conv2d(t, w_reg, padding=2, groups=d), x, '5x5 dw (region)')
    bench(lambda t: jnp.concatenate([
        F.conv2d(t[..., :c1], w_sp1, padding=4, dilation=2, groups=c1),
        t[..., c1 : c1 + c2],
        F.conv2d(t[..., c1 + c2 :], w_sp2, padding=9, dilation=3, groups=d - c1 - c2),
    ], axis=-1), x, '5x5 dw dil2 + 7x7 dw dil3')
    bench(lambda t: F.conv2d(F.conv2d(t, w_in), w_sal, padding=1, groups=2 * hidden)[..., :d],
          x, 'linear_in + 3x3 dw @340ch (SAL)')
    bench(lambda t: F.conv2d(jnp.mean(t, axis=(1, 2), keepdims=True), w11) + t,
          x, 'global mean + 1x1 (DFFM global)')
    bench(lambda t: F.batch_norm_2d(t, jnp.ones(d), jnp.zeros(d), jnp.zeros(d), jnp.ones(d)),
          x, 'batch norm')

    # dw conv expressed as shifted adds (the XLA-dodging candidate fix)
    taps5 = jnp.asarray(rng.standard_normal((5, 5, d), np.float32) * 0.05)

    def dw5_shifted(t):
        acc = jnp.zeros_like(t)
        pad = jnp.pad(t, ((0, 0), (2, 2), (2, 2), (0, 0)))
        h_, w_ = t.shape[1], t.shape[2]
        for dy in range(5):
            for dx in range(5):
                acc = acc + pad[:, dy : dy + h_, dx : dx + w_, :] * taps5[dy, dx]
        return acc

    bench(dw5_shifted, x, '5x5 dw as 25 shifted FMAs')
    return 0


if __name__ == '__main__' and '--extra' not in sys.argv:
    sys.exit(main(None))


def dilated_dw_s2b(t, wk, d, pad):
    """Dilated dw conv as space-to-batch -> regular dw conv -> batch-to-space.
    Exact for H, W divisible by d with 'same'-style padding (the pads stay
    within each sub-grid)."""
    import jax.numpy as jnp

    from resselt_tpu.nn import functional as F

    b, h, w_, c = t.shape
    ph, pw = -h % d, -w_ % d
    if ph or pw:
        t = jnp.pad(t, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hs, ws = t.shape[1] // d, t.shape[2] // d
    s = t.reshape(b, hs, d, ws, d, c).transpose(0, 2, 4, 1, 3, 5).reshape(b * d * d, hs, ws, c)
    s = F.conv2d(s, wk, padding=pad, groups=c)
    s = s.reshape(b, d, d, hs, ws, c).transpose(0, 3, 1, 4, 2, 5).reshape(b, hs * d, ws * d, c)
    return s[:, :h, :w_, :]


def extra(argv=None):
    import jax.numpy as jnp

    from resselt_tpu.nn import functional as F

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    d = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 256, 256, d), np.float32) * 0.1)
    c1, c2 = int(3 / 8 * d), int(1 / 8 * d)
    w_sp1 = jnp.asarray(rng.standard_normal((c1, 1, 5, 5), np.float32) * 0.05)
    w_sp2 = jnp.asarray(rng.standard_normal((d - c1 - c2, 1, 7, 7), np.float32) * 0.05)

    def pair_xla(t):
        return jnp.concatenate([
            F.conv2d(t[..., :c1], w_sp1, padding=4, dilation=2, groups=c1),
            t[..., c1 : c1 + c2],
            F.conv2d(t[..., c1 + c2 :], w_sp2, padding=9, dilation=3, groups=d - c1 - c2),
        ], axis=-1)

    def pair_s2b(t):
        return jnp.concatenate([
            dilated_dw_s2b(t[..., :c1], w_sp1, 2, 2),
            t[..., c1 : c1 + c2],
            dilated_dw_s2b(t[..., c1 + c2 :], w_sp2, 3, 3),
        ], axis=-1)

    got = np.asarray(pair_s2b(x))
    want = np.asarray(pair_xla(x))
    print('max err s2b vs xla:', np.abs(got - want).max())
    bench(pair_xla, x, 'dilated pair XLA')
    bench(pair_s2b, x, 'dilated pair space-to-batch')


if __name__ == '__main__' and '--extra' in sys.argv:
    extra()
