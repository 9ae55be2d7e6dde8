#!/usr/bin/env python
"""FlexNet t-block anatomy on the TPU (family row: 24.7 bf16 MP/s, 5.1% MFU,
192^2 b4, dim 64, 36 blocks).

    python tools/profile_flexnet.py [--tile 192] [--batch 4] [--dtype bfloat16]
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
    print(f'{label:44s} {per_op * 1e3:8.3f} ms', flush=True)
    return per_op


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--tile', type=int, default=192)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax.numpy as jnp

    from resselt_tpu.archs import flexnet as FN
    from resselt_tpu.nn import functional as F
    from resselt_tpu.nn.params import PTree

    dt = jnp.dtype(args.dtype)
    b, s, dim, ws = args.batch, args.tile, 64, 8
    n = s * s
    rng = np.random.default_rng(0)

    def t(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.02, jnp.float32)

    p = PTree({
        'rn1.weight': t(dim), 'rn2.weight': t(dim),
        'gamma1': t(dim), 'gamma2': t(dim),
        'att.omni_shift.conv5x5_reparam.weight': t(dim, 1, 5, 5),
        'att.qkv.weight': t(3 * dim, dim), 'att.qkv.bias': t(3 * dim),
        'att.get_v.weight': t(dim, 1, 3, 3), 'att.get_v.bias': t(dim),
        'att.proj.weight': t(dim, dim), 'att.proj.bias': t(dim),
        'ffn.omni_shift.conv5x5_reparam.weight': t(dim, 1, 5, 5),
        'ffn.key.weight': t(4 * dim, dim),
        'ffn.value.weight': t(dim, 4 * dim),
        'ffn.receptance.weight': t(dim, dim),
    })
    cfgish = type('C', (), {'window_size': ws, 'channel_norm': False})()

    x = jnp.asarray(rng.standard_normal((b, n, dim)) * 0.1, dt)
    ximg = jnp.asarray(rng.standard_normal((b, s, s, dim)) * 0.1, dt)

    print(f'== t-block components ({args.dtype}, {s}^2 b{b}, dim {dim}) ==')
    bench(lambda y: FN._t_block(p, y, s, s, cfgish, dim), x, 'whole t-block')
    bench(lambda y: FN._lmltvit(p.sub('att'), y, s, s, ws, dim), x, 'LMLTVIT attention')
    bench(lambda y: FN._channel_mix(p.sub('ffn'), y, s, s, dim, False), x, 'ChannelMix FFN')
    bench(lambda y: F.conv2d(y, p['att.omni_shift.conv5x5_reparam.weight'], padding=2, groups=dim),
          ximg, 'omni_shift 5x5 dw')

    def lepe_only(y):
        img = y.reshape(b, s, s, dim)
        windows = img.reshape(b, s // ws, ws, s // ws, ws, dim).transpose(0, 1, 3, 2, 4, 5)
        v_img = windows.reshape(-1, ws, ws, dim)
        lepe = F.conv2d(v_img, p['att.get_v.weight'], p['att.get_v.bias'], padding=1, groups=dim)
        return lepe.reshape(b, n, dim)

    bench(lepe_only, x, 'LePE 3x3 dw on 8x8 window batch')

    def attn_core(y):
        img = y.reshape(b, s, s, dim)
        windows = img.reshape(b, s // ws, ws, s // ws, ws, dim).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, dim)
        qkv = F.linear(windows, p['att.qkv.weight'], p['att.qkv.bias'])
        q, k, v = qkv[..., :dim], qkv[..., dim : 2 * dim], qkv[..., 2 * dim :]
        attn = jnp.einsum('bnc,bmc->bnm', q, k, preferred_element_type=jnp.float32).astype(y.dtype) * (dim**-0.5)
        attn = F.softmax(attn)
        out = jnp.einsum('bnm,bmc->bnc', attn, v, preferred_element_type=jnp.float32).astype(y.dtype)
        return out.reshape(b, s // ws, s // ws, ws, ws, dim).transpose(0, 1, 3, 2, 4, 5).reshape(b, n, dim)

    bench(attn_core, x, 'qkv+attn einsums (no lepe/proj)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
