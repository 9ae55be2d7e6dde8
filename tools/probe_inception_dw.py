#!/usr/bin/env python
"""InceptionDWConv2d formulations (mosrv2/gaterv2/gaterv3 token mixer).

Current: slice x into (id, hw, w, h) channel bands, run three small dw
convs on the 6-8ch bands, concat — 2.4 ms at gaterv2 enc0 shapes, mostly
slice/concat relayouts (the band convs pad to 128 lanes either way).

Full-width: run the three dw convs over ALL channels with weights
zero-padded outside their band (same padded-lane VPU work), mask x for
the identity band, and add — no slicing, no concat, everything fusable.

    python tools/probe_inception_dw.py
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
    print(f'{label:52s} {per_op * 1e3:8.3f} ms', flush=True)
    return per_op


def main():
    import jax.numpy as jnp

    from resselt_tpu.nn import functional as F

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    rng = np.random.default_rng(0)
    # (label, c_total, gc, hw, b): gaterv2 enc0 glob mixer and mosrv2 defaults
    cases = [
        ('gaterv2 enc0 96ch gc6 256^2 b8', 96, 6, 256, 8),
        ('mosrv2 80ch gc8 256^2 b8', 80, 8, 256, 8),
    ]
    sq, band = 3, 11
    for label, c, gc, hw, b in cases:
        whw = jnp.asarray(rng.standard_normal((gc, 1, sq, sq)) * 0.1, jnp.float32)
        ww = jnp.asarray(rng.standard_normal((gc, 1, 1, band)) * 0.1, jnp.float32)
        wh = jnp.asarray(rng.standard_normal((gc, 1, band, 1)) * 0.1, jnp.float32)
        bhw = jnp.asarray(rng.standard_normal(gc) * 0.1, jnp.float32)
        bw = jnp.asarray(rng.standard_normal(gc) * 0.1, jnp.float32)
        bh = jnp.asarray(rng.standard_normal(gc) * 0.1, jnp.float32)
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)) * 0.1, jnp.bfloat16)

        def cur(y, c=c, gc=gc, whw=whw, ww=ww, wh=wh, bhw=bhw, bw=bw, bh=bh):
            x_id = y[..., : c - 3 * gc]
            x_hw = y[..., c - 3 * gc : c - 2 * gc]
            x_w = y[..., c - 2 * gc : c - gc]
            x_h = y[..., c - gc :]
            return jnp.concatenate([
                x_id,
                F.conv2d(x_hw, whw, bhw, padding=sq // 2, groups=gc),
                F.conv2d(x_w, ww, bw, padding=(0, band // 2), groups=gc),
                F.conv2d(x_h, wh, bh, padding=(band // 2, 0), groups=gc),
            ], axis=-1)

        # full-width zero-padded dw weights (trace-time constants here;
        # in the arch they'd be built from params per forward — tiny)
        def expand(wg, bg, lo, c=c, gc=gc):
            wf = jnp.zeros((c, 1) + wg.shape[2:], wg.dtype).at[lo : lo + gc].set(wg)
            bf = jnp.zeros((c,), bg.dtype).at[lo : lo + gc].set(bg)
            return wf, bf

        whw_f, bhw_f = expand(whw, bhw, c - 3 * gc)
        ww_f, bw_f = expand(ww, bw, c - 2 * gc)
        wh_f, bh_f = expand(wh, bh, c - gc)
        mask = jnp.zeros((c,), jnp.float32).at[: c - 3 * gc].set(1.0)

        def full(y, whw_f=whw_f, bhw_f=bhw_f, ww_f=ww_f, bw_f=bw_f, wh_f=wh_f, bh_f=bh_f, mask=mask, c=c):
            a = F.conv2d(y, whw_f, bhw_f, padding=sq // 2, groups=c)
            d = F.conv2d(y, ww_f, bw_f, padding=(0, band // 2), groups=c)
            e = F.conv2d(y, wh_f, bh_f, padding=(band // 2, 0), groups=c)
            m = mask.astype(y.dtype)
            # biases land on every channel of each conv; zero them outside
            # their band via the expand() zeros — bands are disjoint, so the
            # three conv outputs + masked identity add exactly
            return y * m + (a + d + e) * (1.0 - m)

        ya = np.asarray(cur(x), np.float32)
        yb = np.asarray(full(x), np.float32)
        err = np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-6)
        print(f'-- {label}: rel err {err:.2e}')
        bench(cur, x, '  current (slice + 3 band dw + concat)')
        bench(full, x, '  full-width zero-padded dw, no concat')
    return 0


if __name__ == '__main__':
    sys.exit(main())
