#!/usr/bin/env python
"""Probe: per-forward cost of the relative-position-bias gather + the
window partition/reverse relayouts at HAT-S 128^2 b8 shapes.

The n=256 attention core (qkv+MHA+proj) microbenches at ~0.34 ms/144
windows (tools/microbench_wattn.py) = ~1.2 ms scaled to HAT's 512
windows, yet profile_hat measures 'window attention only' at 3.76 ms.
This isolates the candidates for the ~2.5 ms gap:

  gather    — bias = table[rpi].reshape(n,n,h).transpose(2,0,1)
  onehot    — same bias via one-hot matmul formulation
  part+rev  — window_partition + window_reverse round-trip
  core      — attention block with a PRE-DENSE bias (no gather)
  core+g    — attention block with the in-block gather (current code)
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

REPS = 4


def bench(fn, args_, label, min_seconds=2.0):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(a, x0, n):
        def body(_, carry):
            y = carry
            for _ in range(REPS):
                y = y + jnp.asarray(1e-3, y.dtype) * fn(a, y)
            return y

        return jnp.sum(jax.lax.fori_loop(0, n, body, x0).astype(jnp.float32))

    a, x = args_
    float(loop(a, x, jnp.int32(2)))
    t0 = time.perf_counter()
    float(loop(a, x, jnp.int32(2)))
    dt1 = time.perf_counter() - t0
    n2 = 2 + max(2, int(2 * min_seconds / max(dt1, 1e-3)) + 1)
    t0 = time.perf_counter()
    float(loop(a, x, jnp.int32(n2)))
    dt2 = time.perf_counter() - t0
    per = max(dt2 - dt1, 1e-6) / ((n2 - 2) * REPS)
    print(f'{label:10s} {per * 1e3:8.3f} ms/op', flush=True)
    return per


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--tile', type=int, default=128)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--ws', type=int, default=16)
    ap.add_argument('--c', type=int, default=144)
    ap.add_argument('--heads', type=int, default=6)
    ap.add_argument('--dtype', default='bf16', choices=['f32', 'bf16'])
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
        multi_head_attention, relative_position_index, window_partition, window_reverse,
    )

    t, b, ws, c, heads = args.tile, args.batch, args.ws, args.c, args.heads
    n = ws * ws
    nw = (t // ws) ** 2 * b
    hd = c // heads
    scale = hd**-0.5
    dt = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    print(f'tile {t} b {b} ws {ws} c {c} heads {heads}: n={n} windows={nw} {args.dtype}')

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal(((2 * ws - 1) ** 2, heads), np.float32) * 0.1)
    rpi = jnp.asarray(relative_position_index(ws, ws))
    x_img = jnp.asarray(rng.standard_normal((b, t, t, c), np.float32) * 0.1).astype(dt)
    wins = window_partition(x_img, ws)
    params = {
        'qkv.weight': jnp.asarray(rng.standard_normal((3 * c, c), np.float32) * 0.05).astype(dt),
        'qkv.bias': jnp.asarray(rng.standard_normal((3 * c,), np.float32) * 0.05).astype(dt),
        'proj.weight': jnp.asarray(rng.standard_normal((c, c), np.float32) * 0.05).astype(dt),
        'proj.bias': jnp.asarray(rng.standard_normal((c,), np.float32) * 0.05).astype(dt),
    }
    dense_bias = table[rpi.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1).astype(dt)

    def gather_bias(a, y):
        tb, idx = a
        bias = tb[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1)
        # touch y so the loop carries a dependency of the right shape
        return y * 0 + jnp.sum(bias).astype(y.dtype)

    def onehot_bias(a, y):
        tb, idx = a
        oh = jax.nn.one_hot(idx.reshape(-1), tb.shape[0], dtype=tb.dtype)
        bias = (oh @ tb).reshape(n, n, heads).transpose(2, 0, 1)
        return y * 0 + jnp.sum(bias).astype(y.dtype)

    import jax

    def part_rev(a, y):
        w2 = window_partition(y, ws)
        return window_reverse(w2, ws, t, t)

    def core_dense(a, y):
        p = a
        qkv = F.linear(y, p['qkv.weight'], p['qkv.bias'])
        q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
        out = multi_head_attention(q, k, v, heads, scale, bias=dense_bias)
        return F.linear(out, p['proj.weight'], p['proj.bias'])

    def core_gather(a, y):
        p, tb, idx = a
        bias = tb[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1).astype(y.dtype)
        qkv = F.linear(y, p['qkv.weight'], p['qkv.bias'])
        q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
        out = multi_head_attention(q, k, v, heads, scale, bias=bias)
        return F.linear(out, p['proj.weight'], p['proj.bias'])

    def make_chunked(nchunks):
        def core_chunked(a, y):
            p = a
            qkv = F.linear(y, p['qkv.weight'], p['qkv.bias'])
            q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
            outs = []
            cs = q.shape[0] // nchunks
            for i in range(nchunks):
                s = slice(i * cs, (i + 1) * cs)
                outs.append(multi_head_attention(q[s], k[s], v[s], heads, scale, bias=dense_bias))
            out = jnp.concatenate(outs, axis=0)
            return F.linear(out, p['proj.weight'], p['proj.bias'])

        return core_chunked

    def core_scan(a, y):
        p = a
        qkv = F.linear(y, p['qkv.weight'], p['qkv.bias'])
        q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
        nchunks = max(1, q.shape[0] // 128)
        qs = q.reshape(nchunks, -1, n, c)
        ks = k.reshape(nchunks, -1, n, c)
        vs = v.reshape(nchunks, -1, n, c)
        out = jax.lax.map(
            lambda t: multi_head_attention(t[0], t[1], t[2], heads, scale, bias=dense_bias),
            (qs, ks, vs))
        out = out.reshape(-1, n, c)
        return F.linear(out, p['proj.weight'], p['proj.bias'])

    sc = jnp.zeros((8, 128), dt)
    bench(gather_bias, ((table, rpi), sc), 'gather')
    bench(onehot_bias, ((table, rpi), sc), 'onehot')
    bench(part_rev, (None, x_img), 'part+rev')
    bench(core_dense, (params, wins), 'core')
    bench(core_gather, ((params, table, rpi), wins), 'core+g')
    for nch in (2, 4, 8, 16):
        if nw % nch == 0 and nw // nch >= 32:
            bench(make_chunked(nch), (params, wins), f'core/{nch}')
    if nw >= 256:
        bench(core_scan, (params, wins), 'corescan')
    return 0


if __name__ == '__main__':
    sys.exit(main())
