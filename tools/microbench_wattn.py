#!/usr/bin/env python
"""Microbench: window-attention block variants at HAT/ATD n=256 shapes.

    python tools/microbench_wattn.py [--tile 224] [--dtype bf16]

Compares, on one attention block (qkv linear -> window MHA -> proj) at
serving shapes, amortized >= 4 ops per on-device fori_loop iteration
(CLAUDE.md methodology — per-op numbers below ~0.25 ms are floored by the
loop overhead otherwise):

  xla     — the plain multi_head_attention path
  fused   — ops/window_attention.py kernel, unaligned per-head slices
  packed  — nn/window.py::packed_qkv_attention (head padding folded into
            the projection weights; VERDICT r2 #2's "head-packed" probe)

Run BEFORE wiring any new default dispatch; the dead-end list in CLAUDE.md
records what must not be retried.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

REPS = 4  # ops per loop iteration


def bench(fn, params, x, label, min_seconds=2.0):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(p, x0, n):
        def body(_, carry):
            y = carry
            for _ in range(REPS):
                y = y + jnp.asarray(1e-3, y.dtype) * fn(p, y)
            return y

        return jnp.sum(jax.lax.fori_loop(0, n, body, x0).astype(jnp.float32))

    float(loop(params, x, jnp.int32(2)))  # compile + warm

    def run(n):
        t0 = time.perf_counter()
        float(loop(params, x, jnp.int32(n)))
        return time.perf_counter() - t0

    dt1 = run(2)
    n2 = 2 + max(2, int(2 * min_seconds / max(dt1, 1e-3)) + 1)
    dt2 = run(n2)
    per_op = max(dt2 - dt1, 1e-6) / ((n2 - 2) * REPS)
    print(f'{label:8s} {per_op * 1e3:8.3f} ms/op')
    return per_op


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--tile', type=int, default=224)
    ap.add_argument('--ws', type=int, default=16)
    ap.add_argument('--c', type=int, default=144)
    ap.add_argument('--heads', type=int, default=6)
    ap.add_argument('--hd-pad', type=int, default=32)
    ap.add_argument('--dtype', default='f32', choices=['f32', 'bf16'])
    ap.add_argument('--shift', action='store_true', help='include the shift mask')
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax.numpy as jnp

    from resselt_tpu.nn import functional as F
    from resselt_tpu.nn.params import PTree
    from resselt_tpu.nn.window import (
        multi_head_attention, packed_qkv_attention, swin_attn_mask,
    )
    from resselt_tpu.ops.window_attention import window_mha_pallas

    tile, ws, c, heads = args.tile, args.ws, args.c, args.heads
    n = ws * ws
    nw = (tile // ws) ** 2
    hd = c // heads
    scale = hd**-0.5
    dtype = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((nw, n, c), np.float32) * 0.1).astype(dtype)
    params = {
        'qkv.weight': jnp.asarray(rng.standard_normal((3 * c, c), np.float32) * 0.05).astype(dtype),
        'qkv.bias': jnp.asarray(rng.standard_normal((3 * c,), np.float32) * 0.05).astype(dtype),
        'proj.weight': jnp.asarray(rng.standard_normal((c, c), np.float32) * 0.05).astype(dtype),
        'proj.bias': jnp.asarray(rng.standard_normal((c,), np.float32) * 0.05).astype(dtype),
    }
    bias = jnp.asarray(rng.standard_normal((heads, n, n), np.float32) * 0.1)
    mask = None
    if args.shift:
        mask = jnp.asarray(swin_attn_mask(tile, tile, ws, ws // 2), dtype)

    print(f'tile {tile} ws {ws} c {c} heads {heads} (n={n}, nW={nw}) dtype {args.dtype} '
          f'mask={"yes" if mask is not None else "no"}')

    def xla_block(p, xin):
        pt = PTree(p)
        qkv = F.linear(xin, p['qkv.weight'], p['qkv.bias'])
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        out = multi_head_attention(q, k, v, heads, scale, bias=bias.astype(xin.dtype), mask=mask)
        return F.linear(out, pt['proj.weight'], pt.get('proj.bias'))

    def fused_block(p, xin):
        pt = PTree(p)
        qkv = F.linear(xin, p['qkv.weight'], p['qkv.bias'])
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        out = window_mha_pallas(q, k, v, bias, mask, num_heads=heads, scale=float(scale))
        return F.linear(out, pt['proj.weight'], pt.get('proj.bias'))

    def packed_block(p, xin):
        return packed_qkv_attention(PTree(p), xin, bias, mask, heads, hd_pad=args.hd_pad)

    from resselt_tpu.nn import window as W

    W.use_fused_attention(False)  # keep the xla row honest
    t_xla = bench(xla_block, params, x, 'xla')
    t_fused = bench(fused_block, params, x, 'fused')
    t_packed = bench(packed_block, params, x, 'packed')
    print(f'packed vs xla: {t_xla / t_packed:.3f}x   fused vs xla: {t_xla / t_fused:.3f}x')
    return 0


if __name__ == '__main__':
    sys.exit(main(None))
