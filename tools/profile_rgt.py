#!/usr/bin/env python
"""RGT block anatomy at the serving shape (t128 -> 160^2 window, b2).

RGT is the only config-5-class family without per-op numbers (VERDICT r3
#6): 10.1% MFU, serving 3.98 f32 / 5.22 bf16 MP/s.  Blocks alternate
L_SA (DAT-style dual rectangular-window attention, split 8x8) with RG_SA
(recursive-downsampled global cross-attention, rgt/arch.py:450-545):
q over all n tokens against k/v from a 4^t-downsampled map, so the score
matrix is a skinny (n, n/256).  Candidate hotspots: the recursive
depthwise stride-4 reduction chain, the skinny attention einsums, the
depthwise CPE/get_v convs, and SGFN.

    python tools/profile_rgt.py [--tile 160] [--batch 2] [--dtype bfloat16]
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
                # shape-agnostic dependency: mean keeps every output
                # element live (no DCE) whatever shape fn returns
                y = y + jnp.asarray(1e-6, y.dtype) * jnp.mean(fn(y)).astype(y.dtype)
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--tile', type=int, default=160)  # serving window: t128 + 2*16
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    sys.path.insert(0, '/root/reference')
    import torch

    torch.set_grad_enabled(False)
    torch.manual_seed(0)
    from resselt.archs.rgt.arch import RGT

    tm = RGT().eval()  # reference defaults: dim 180, depth (2,2,2,2), heads 2
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
    del tm

    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.archs import rgt as A
    from resselt_tpu.nn.params import PTree

    model = resselt_tpu.load_from_state_dict(sd)
    cfg = model.config
    p = PTree(model.params)
    print(f'cfg: dim={cfg.embed_dim} depth={cfg.depth} heads={cfg.num_heads} '
          f'split={cfg.split_size} c_ratio={cfg.c_ratio}')

    dt = jnp.dtype(args.dtype)
    b, s = args.batch, args.tile
    heads = cfg.num_heads[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, s, s, cfg.embed_dim)) * 0.1, dt)
    bp = p.sub('layers.0.blocks.0')   # L_SA block
    bp1 = p.sub('layers.0.blocks.1')  # RG_SA block

    bench(lambda y: A._block(bp, y, cfg, heads, 0, 0), x, 'L_SA block (norm+attn+SGFN+HAI)')
    bench(lambda y: A._block(bp1, y, cfg, heads, 0, 1), x, 'RG_SA block (norm+attn+SGFN+HAI)')
    bench(lambda y: A._l_sa(bp.sub('attn'), y, cfg, heads, False), x, '  L_SA attn (no shift)')
    bench(lambda y: A._l_sa(bp.sub('attn'), y, cfg, heads, True), x, '  L_SA attn (shifted)')
    bench(lambda y: A._rg_sa(bp1.sub('attn'), y, heads, cfg.c_ratio), x, '  RG_SA attn')
    bench(lambda y: A._sgfn(bp.sub('mlp'), y, int(cfg.embed_dim * cfg.mlp_ratio)), x, '  SGFN')

    # RG_SA sub-steps
    ap_ = bp1.sub('attn')
    c = cfg.embed_dim
    import math

    _time = max(max(int(math.log(s // 16, 4)), int(math.log(s // 16, 4))), 2)
    print(f'RG_SA recursion: {_time} stride-4 depthwise reductions '
          f'({s}^2 -> {s // 4 ** _time}^2 kv map)')

    def reduction_chain(y):
        _x = y
        for _ in range(_time):
            _x = ap_.conv('reduction1', _x, stride=4, groups=c)
        return _x

    bench(reduction_chain, x, '    reduction1 chain (dw stride-4 x%d)' % _time)

    def kv_proj(y):
        _x = reduction_chain(y)
        _x = ap_.conv('dwconv', _x, padding=1, groups=c)
        return ap_.conv('conv', _x)

    bench(kv_proj, x, '    reduction + dwconv + 1x1')

    from resselt_tpu.nn import functional as F

    cr = int(c * cfg.c_ratio)
    n = s * s

    def q_proj(y):
        xs = y.reshape(b, n, c)
        return F.linear(xs, ap_['q.weight'], ap_.get('q.bias'))

    bench(q_proj, x, '    q projection (n x c -> n x cr)')

    # skinny attention with synthetic k/v at the recursion output size
    np_ = (s // 4 ** _time) ** 2
    k_ = jnp.asarray(rng.standard_normal((b, heads, np_, cr // heads)) * 0.1, dt)
    v_ = jnp.asarray(rng.standard_normal((b, heads, np_, c // heads)) * 0.1, dt)

    def skinny_attn(y):
        xs = y.reshape(b, n, c)
        q = F.linear(xs, ap_['q.weight'], ap_.get('q.bias')).reshape(
            b, n, heads, cr // heads).transpose(0, 2, 1, 3)
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k_,
                          preferred_element_type=jnp.float32).astype(y.dtype)
        attn = F.softmax(attn)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v_,
                         preferred_element_type=jnp.float32).astype(y.dtype)
        return out.transpose(0, 2, 1, 3).reshape(b, s, s, c)

    bench(skinny_attn, x, '    q-proj + skinny attn (n x %d scores)' % np_)
    bench(lambda y: ap_.conv('cpe', y, padding=1, groups=c), x, '    cpe dw 3x3 (at full res for scale)')
    bench(lambda y: bp.sub('attn').conv('get_v', y, padding=1, groups=c), x,
          '  L_SA get_v dw 3x3')
    return 0


if __name__ == '__main__':
    sys.exit(main())
