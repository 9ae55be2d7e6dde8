#!/usr/bin/env python
"""OCAB overlap-window assembly sub-step costs (6.5 ms measured vs ~0.4 ms
bandwidth floor at HAT-S 128^2 b8 bf16, ws=16 owin=24 g=8).

Steps: row-stack (na slices) -> col-stack (na slices) -> 8-D transpose ->
reshape.  Also tries: chunk-wise assembly (9 simpler 6-D transposes,
token order permuted — legal because kv token order only needs a matching
rpi permutation), and a no-materialize variant that feeds the attention
einsum directly from the (b, ni, g, nj, g, c) chunk layout.

    python tools/probe_ocab_asm.py
"""

from __future__ import annotations

import math
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

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    from resselt_tpu.archs.hat import _overlap_windows

    b, s, c2 = 8, 128, 288
    ws, owin = 16, 24
    g = math.gcd(ws, owin)  # 8
    na = owin // g  # 3
    ni = nj = s // ws  # 8
    pad = (owin - ws) // 2  # 4
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.standard_normal((b, s, s, c2)) * 0.1, dt)

    def back(z):
        # force materialization, same output shape as input
        return z.reshape(-1)[: b * s * s * c2].reshape(b, s, s, c2)

    bench(lambda y: back(_overlap_windows(y, ws, owin)), kv, 'full assembly (current)')

    def rows_only(y):
        kvp = jnp.pad(y, ((0, 0), (pad, pad + ws - g), (pad, pad + ws - g), (0, 0)))
        wp = kvp.shape[2]
        rows = jnp.stack(
            [kvp[:, g * a : g * a + ws * ni].reshape(b, ni, ws, wp, c2)[:, :, :g] for a in range(na)],
            axis=2,
        )
        return back(rows)

    bench(rows_only, kv, 'row-stack only')

    def chunks(y):
        """9 chunk slices, each (b, ni, g, nj, g, c) -> (b, ni, nj, g, g, c);
        stack -> (b, ni, nj, 9, g, g, c); token order (e, r, s)."""
        kvp = jnp.pad(y, ((0, 0), (pad, pad + ws - g), (pad, pad + ws - g), (0, 0)))
        outs = []
        for ar in range(na):
            for ec in range(na):
                ch = kvp[:, g * ar : g * ar + ws * ni, g * ec : g * ec + ws * nj]
                ch = ch.reshape(b, ni, ws, nj * ws, c2)[:, :, :g]
                ch = ch.reshape(b, ni, g, nj, ws, c2)[:, :, :, :, :g]
                outs.append(ch.transpose(0, 1, 3, 2, 4, 5))
        z = jnp.stack(outs, axis=3)  # (b, ni, nj, 9, g, g, c)
        return back(z.reshape(b * ni * nj, owin * owin, c2))

    bench(chunks, kv, 'chunk-wise (9 x 6-D transposes)')

    def chunks_noT(y):
        """chunk slices stacked WITHOUT the nj move: (9, b, ni, g, nj, g, c)."""
        kvp = jnp.pad(y, ((0, 0), (pad, pad + ws - g), (pad, pad + ws - g), (0, 0)))
        outs = []
        for ar in range(na):
            for ec in range(na):
                ch = kvp[:, g * ar : g * ar + ws * ni, g * ec : g * ec + ws * nj]
                ch = ch.reshape(b, ni, ws, nj * ws, c2)[:, :, :g]
                ch = ch.reshape(b, ni, g, nj, ws, c2)[:, :, :, :, :g]
                outs.append(ch)
        return back(jnp.stack(outs))

    bench(chunks_noT, kv, 'chunk slices, no transpose (lower bound-ish)')

    # attention consuming the chunk layout directly via dot_general batching:
    # q: (b, ni, wsq, nj, wsq, c) reshaped windows; kv chunks (9, b, ni, g, nj, g, 2c)
    heads, hd = 6, 24
    cq = heads * hd
    q = jnp.asarray(rng.standard_normal((b, s, s, cq)) * 0.1, dt)

    def attn_direct(y):
        kvp = jnp.pad(y, ((0, 0), (pad, pad + ws - g), (pad, pad + ws - g), (0, 0)))
        ks, vs = [], []
        for ar in range(na):
            for ec in range(na):
                ch = kvp[:, g * ar : g * ar + ws * ni, g * ec : g * ec + ws * nj]
                ch = ch.reshape(b, ni, ws, nj * ws, c2)[:, :, :g]
                ch = ch.reshape(b, ni, g, nj, ws, c2)[:, :, :, :, :g]
                ks.append(ch[..., : c2 // 2])
                vs.append(ch[..., c2 // 2 :])
        k = jnp.stack(ks)  # (9, b, ni, g, nj, g, cq)
        v = jnp.stack(vs)
        qw = q.reshape(b, ni, ws, nj, ws, heads, hd)
        kh = k.reshape(9, b, ni, g, nj, g, heads, hd)
        # scores: batch (b, ni, nj, heads), q tokens (ws, ws), kv tokens (9, g, g)
        sc = jnp.einsum('birjshd,ebiujvhd->bijhrseuv', qw, kh,
                        preferred_element_type=jnp.float32).astype(q.dtype)
        sc = sc.reshape(b, ni, nj, heads, ws * ws, 9 * g * g)
        import resselt_tpu.nn.functional as F

        at = F.softmax(sc).reshape(b, ni, nj, heads, ws, ws, 9, g, g)
        vh = v.reshape(9, b, ni, g, nj, g, heads, hd)
        out = jnp.einsum('bijhrseuv,ebiujvhd->birjshd', at, vh,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        return out.reshape(b, s, s, cq)

    def attn_materialized(y):
        patches = _overlap_windows(y, ws, owin)  # (b*nw, 576, 2c)
        k = patches[..., : c2 // 2].reshape(-1, owin * owin, heads, hd).transpose(0, 2, 1, 3)
        v = patches[..., c2 // 2 :].reshape(-1, owin * owin, heads, hd).transpose(0, 2, 1, 3)
        qw = q.reshape(b, ni, ws, nj, ws, cq).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, heads, hd)
        qh = qw.transpose(0, 2, 1, 3)
        sc = jnp.einsum('bhnd,bhmd->bhnm', qh, k, preferred_element_type=jnp.float32).astype(q.dtype)
        import resselt_tpu.nn.functional as F

        at = F.softmax(sc)
        out = jnp.einsum('bhnm,bhmd->bhnd', at, v, preferred_element_type=jnp.float32).astype(q.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, ni, nj, ws, ws, cq).transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(b, s, s, cq)

    # attn_direct: REJECTED before measurement — XLA lays the 9-D score
    # tensor out as f32[...]{T(8,128)} padding the (9,8,8) kv-token dims
    # 16x -> 25.8 GB allocation, compile-time OOM.  Materialized kv stays.
    del attn_direct
    bench(lambda y: jnp.concatenate([attn_materialized(y)] * 2, axis=-1), kv,
          'cross-attn, materialized kv (current shape)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
