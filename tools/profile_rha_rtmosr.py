#!/usr/bin/env python
"""Block anatomy for the two un-annotated low-MFU rows: rha (9.8%) and
rtmosr (7.1%).  Times each block-level component at the bench shapes to
decide implementation-pathology vs model-inherent.

    python tools/profile_rha_rtmosr.py [--family rha|rtmosr|both]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def _fit(out, like):
    """Fold an op output back to the loop-carry shape without dropping any
    computed values (sum over channel groups / zero-pad — never slice, a
    slice would let XLA dead-code-eliminate part of the op)."""
    import jax.numpy as jnp

    co, ci = out.shape[-1], like.shape[-1]
    if co == ci:
        return out
    if co > ci and co % ci == 0:
        return out.reshape(*out.shape[:-1], co // ci, ci).sum(-2)
    if co < ci:
        return jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, ci - co)])
    raise ValueError((co, ci))


def bench(fn, x, label, reps=4, min_seconds=1.5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x0, n):
        def body(_, carry):
            y = carry
            for _ in range(reps):
                y = y + jnp.asarray(1e-6, y.dtype) * _fit(fn(y), y)
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


def sd_of(tm):
    return {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}


def profile_rha():
    import torch

    torch.set_grad_enabled(False)
    torch.manual_seed(0)
    from resselt.archs.rha.arch import RHA

    sd = sd_of(RHA())
    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.archs import rha as R
    from resselt_tpu.nn.params import PTree

    model = resselt_tpu.load_from_state_dict(sd)
    cfg = model.config
    p = PTree(model.params)
    print(f'rha cfg: dim={cfg.dim} exp={cfg.expansion_ratio} ws={cfg.window_size} '
          f'groups={cfg.group_blocks} res={cfg.res_blocks} down={cfg.down_list}')

    rng = np.random.default_rng(0)
    b, s = 4, 192
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, s, s, cfg.dim)) * 0.1, dt)
    bp = p.sub('body.0.body.0')

    bench(lambda y: R._gated_block(bp, y, cfg, cfg.down_list[0], 0), x, 'whole GatedCNNBlock (down=%d)' % cfg.down_list[0])
    hidden = int(cfg.expansion_ratio * cfg.dim)
    bench(lambda y: bp.conv('fc1', y, padding=1), x, '  fc1 3x3 conv (dim->3~hidden)')
    xc = jnp.asarray(rng.standard_normal((b, s, s, cfg.dim)) * 0.1, dt)
    bench(lambda y: R._hybrid_attention(bp.sub('conv'), y, cfg.down_list[0], 0, cfg.window_size),
          xc, '  HybridAttention (half dw5x5 + FLA)')
    half = cfg.dim // 2
    xh = xc[..., :half]
    bench(lambda y: R._fla(bp.sub('conv.att.2'), y, cfg.window_size), xh, '    FLA window linear attention')
    import jax

    from resselt_tpu.nn import functional as F

    fp = bp.sub('conv.att.2')

    def focusing_only(y):
        b0, h, w, c = y.shape
        ws = cfg.window_size
        windows = y.reshape(b0, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        q = windows
        k = windows
        ff = 3.0
        scale = jax.nn.softplus(fp['scale'].astype(y.dtype)).reshape(1, 1, c)
        q = q / scale
        k = k / scale
        qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
        kn = jnp.linalg.norm(k, axis=-1, keepdims=True)
        q = q**ff
        k = k**ff
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * qn
        k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * kn
        return (q + k).reshape(y.shape)

    bench(focusing_only, xh, '    focusing norm/power elementwise only')
    xg = jnp.asarray(rng.standard_normal((b, s, s, hidden)) * 0.1, dt)
    bench(lambda y: F.mish(bp.conv('fc2', y, padding=1)), xg, '  fc2 3x3 conv + mish (hidden->dim)')
    return 0


def profile_rtmosr():
    import torch

    torch.set_grad_enabled(False)
    torch.manual_seed(0)
    from resselt.archs.rtmosr.arch import RTMoSR

    sd = sd_of(RTMoSR(unshuffle_mod=True))
    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.archs import rtmosr as R
    from resselt_tpu.nn import functional as F
    from resselt_tpu.nn.params import PTree

    model = resselt_tpu.load_from_state_dict(sd)
    cfg = model.config
    p = PTree(model.params)
    print(f'rtmosr cfg: dim={cfg.dim} ffn={cfg.ffn_expansion} blocks={cfg.n_blocks} '
          f'se={cfg.se} dccm={cfg.dccm} unshuffle={cfg.unshuffle_mod}')

    rng = np.random.default_rng(0)
    b, s = 8, 128  # after 2x unshuffle of a 256 tile
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, s, s, cfg.dim)) * 0.1, dt)
    bp = p.sub('body.0')

    bench(lambda y: R._gated_block(bp, y, cfg), x, 'whole GatedCNNBlock')
    bench(lambda y: F.rms_norm_ref(y, bp['norm.scale'], bp['norm.offset']), x, '  rms_norm')
    bench(lambda y: bp.conv('fc1.conv_3x3_rep', y, padding=1), x, '  fc1 3x3 (dim->2.5dim)')

    def conv_path(y):
        pu = F.pixel_unshuffle(y, 2)
        poll = F.max_pool2d(y, 2)
        poll = bp.conv('conv.0.poll.1.conv_3x3_rep', poll, padding=1)
        c = pu + poll
        c = bp.conv('conv.1.conv5x5_reparam', c, padding=2, groups=4 * cfg.dim)
        if cfg.se:
            c = R._cse(bp.sub('conv.2'), c)
        return F.pixel_shuffle(c, 2)

    bench(conv_path, x, '  conv path (unshuffle+pool+dw5x5+PS)')
    hidden = int(cfg.ffn_expansion * cfg.dim)
    xg = jnp.asarray(rng.standard_normal((b, s, s, hidden)) * 0.1, dt)
    bench(lambda y: F.mish(y) * y, xg, '  mish gate elementwise (hidden ch)')
    if cfg.dccm:
        bench(lambda y: F.mish(bp.conv('fc2.conv_3x3_rep', y, padding=1)), xg[..., :hidden],
              '  fc2 3x3 (hidden->dim) + mish')
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--family', default='both', choices=['rha', 'rtmosr', 'both'])
    args = ap.parse_args(argv)
    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    sys.path.insert(0, '/root/reference')
    if args.family in ('rha', 'both'):
        profile_rha()
    if args.family in ('rtmosr', 'both'):
        profile_rtmosr()
    return 0


if __name__ == '__main__':
    sys.exit(main())
