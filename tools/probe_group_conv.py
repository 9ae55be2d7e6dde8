#!/usr/bin/env python
"""Grouped-conv formulations on the TPU: XLA grouped vs block-diag dense.

profile_gaterv2.py found XLA's 2-channels-per-group 3x3 conv running at
0.06 TFLOP/s (16 ms for 0.9 GFLOP, 96ch groups=48 @256^2 b8 bf16) — the
dominant cost of the whole gaterv2 family.  A dense conv with the group
weights placed block-diagonally computes the identical sums (zeros add
nothing) at groups-times the FLOPs but on the MXU.

    python tools/probe_group_conv.py
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
    print(f'{label:46s} {per_op * 1e3:8.3f} ms', flush=True)
    return per_op


def block_diag_weight(w, groups: int, cin: int):
    """(cout, cpg, kh, kw) grouped weight -> (cout, cin, kh, kw) dense."""
    import jax.numpy as jnp

    cout, cpg, kh, kw = w.shape
    opg = cout // groups
    dense = jnp.zeros((cout, cin, kh, kw), w.dtype)
    for g in range(groups):
        dense = dense.at[g * opg : (g + 1) * opg, g * cpg : (g + 1) * cpg].set(
            w[g * opg : (g + 1) * opg]
        )
    return dense


def main():
    import jax
    import jax.numpy as jnp

    from resselt_tpu.nn import functional as F

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    rng = np.random.default_rng(0)
    cases = [
        # (label, c, cpg, k, hw, batch, dtype)
        ('gaterv2 local.2 enc0', 96, 2, 3, 256, 8, 'bfloat16'),
        ('gaterv2 local.2 enc0 f32', 96, 2, 3, 256, 8, 'float32'),
        ('gaterv2 local.2 enc1', 192, 2, 3, 128, 8, 'bfloat16'),
        ('gaterv2 local.2 enc3', 768, 2, 3, 32, 8, 'bfloat16'),
        ('true dw 96ch (cpg=1)', 96, 1, 3, 256, 8, 'bfloat16'),
        ('true dw 96ch f32', 96, 1, 3, 256, 8, 'float32'),
        ('gater dconv 7x7 dw 64ch', 64, 1, 7, 256, 8, 'bfloat16'),
        ('gater dconv 7x7 dw 64ch f32', 64, 1, 7, 256, 8, 'float32'),
    ]
    for label, c, cpg, k, hw, b, dt in cases:
        groups = c // cpg
        w = jnp.asarray(rng.standard_normal((c, cpg, k, k)) * 0.05, jnp.float32)
        wd = block_diag_weight(w, groups, c)
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)) * 0.1, jnp.dtype(dt))
        y1 = np.asarray(F.conv2d(x, w, padding=k // 2, groups=groups), np.float32)
        y2 = np.asarray(F.conv2d(x, wd, padding=k // 2), np.float32)
        err = np.abs(y1 - y2).max() / max(np.abs(y1).max(), 1e-6)
        print(f'-- {label}: rel err {err:.2e}')
        t_g = bench(lambda y, w=w, groups=groups, k=k: F.conv2d(y, w, padding=k // 2, groups=groups),
                    x, f'  XLA grouped ({groups}g x {cpg}ch, {dt})')
        t_d = bench(lambda y, wd=wd, k=k: F.conv2d(y, wd, padding=k // 2),
                    x, f'  block-diag dense {c}->{c}')
        gflop_d = 2 * c * c * k * k * b * hw * hw / 1e9
        print(f'  speedup {t_g / t_d:.2f}x  (dense {gflop_d / t_d / 1e3:.1f} TFLOP/s padded-useful)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
