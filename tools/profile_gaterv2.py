#!/usr/bin/env python
"""GateRv2 block anatomy on the TPU: where do 225 ms/fwd (bf16 256^2 b8) go?

The family table has gaterv2 at 4.7% MFU / 3.3 MP/s.  The U-net moves only
~2 GB of activations per forward (2.5 ms at HBM rate) and carries 745
GFLOP (4 ms at matmul rate), so the measured 225 ms means some op class
runs ~100x below the roofline.  This times MetaGated blocks at each
stage's real (dim, h, w), the latent Taylor-attention block, and the
component ops of a stage-0 block, with the calibrated amortized loop
(tools/profile_eimn.py methodology).

    python tools/profile_gaterv2.py [--tile 256] [--batch 8] [--dtype bfloat16]
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


def rand_params(dim: int, seed: int):
    """Random MetaGated params at width ``dim`` (keys as in archs/gaterv2.py)."""
    rng = np.random.default_rng(seed)
    hidden = int(1.5 * dim)
    gc = max(dim // 8, 1)  # InceptionDWConv2d branch width (mosrv2/arch.py:174)
    sq, band = 3, 11

    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    return {
        'local.0.scale': t(dim), 'local.0.offset': t(dim),
        'local.1.weight': t(2 * dim, dim, 1, 1), 'local.1.bias': t(2 * dim),
        'local.2.weight': t(2 * dim, 2, 3, 3), 'local.2.bias': t(2 * dim),
        'sca.1.weight': t(dim, dim, 1, 1), 'sca.1.bias': t(dim),
        'gamma0': t(dim), 'gamma1': t(dim),
        'glob.norm.scale': t(dim), 'glob.norm.offset': t(dim),
        'glob.fc1.weight': t(2 * hidden, dim, 1, 1), 'glob.fc1.bias': t(2 * hidden),
        'glob.token_mix.dwconv_hw.weight': t(gc, 1, sq, sq),
        'glob.token_mix.dwconv_hw.bias': t(gc),
        'glob.token_mix.dwconv_w.weight': t(gc, 1, 1, band),
        'glob.token_mix.dwconv_w.bias': t(gc),
        'glob.token_mix.dwconv_h.weight': t(gc, 1, band, 1),
        'glob.token_mix.dwconv_h.bias': t(gc),
        'glob.fc2.weight': t(dim, hidden, 1, 1), 'glob.fc2.bias': t(dim),
    }


def rand_latent_params(dim: int, seed: int):
    rng = np.random.default_rng(seed)
    hidden = int(1.5 * dim)

    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    return {
        'norm.scale': t(dim), 'norm.offset': t(dim),
        'fc1.weight': t(2 * hidden, dim, 1, 1), 'fc1.bias': t(2 * hidden),
        'token_mix.query_conv.weight': t(dim // 8, dim, 1, 1),
        'token_mix.query_conv.bias': t(dim // 8),
        'token_mix.key_conv.weight': t(dim // 8, dim, 1, 1),
        'token_mix.key_conv.bias': t(dim // 8),
        'token_mix.value_conv.weight': t(dim, dim, 1, 1),
        'token_mix.value_conv.bias': t(dim),
        'fc2.weight': t(dim, hidden, 1, 1), 'fc2.bias': t(dim),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--tile', type=int, default=256)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--dim', type=int, default=48)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import jax.numpy as jnp

    from resselt_tpu.archs.gaterv2 import _gated_cnn, _meta_gated, _taylor_attention
    from resselt_tpu.nn import functional as F
    from resselt_tpu.nn.params import PTree

    dt = jnp.dtype(args.dtype)
    b, s, d0 = args.batch, args.tile, args.dim
    rng = np.random.default_rng(0)

    print(f'== MetaGated per stage (dtype {args.dtype}, batch {b}) ==')
    stage_ms = []
    for i in range(4):
        dim = d0 * (2**i)
        hw = s // (2**i)
        p = PTree({k: jnp.asarray(v) for k, v in rand_params(dim, i).items()})
        x = jnp.asarray(rng.standard_normal((b, hw, hw, dim)) * 0.1, dt)
        ms = bench(lambda y, p=p, dim=dim: _meta_gated(p, y, dim), x,
                   f'MetaGated enc{i} {dim}ch @{hw}^2')
        stage_ms.append(ms)

    print('== latent Taylor-attention block ==')
    dim = d0 * 16
    hw = s // 16
    p = PTree({k: jnp.asarray(v) for k, v in rand_latent_params(dim, 9).items()})
    x = jnp.asarray(rng.standard_normal((b, hw, hw, dim)) * 0.1, dt)
    lat_ms = bench(lambda y, p=p, dim=dim: _gated_cnn(p, y, dim, att=True), x,
                   f'latent GatedCNN+attn {dim}ch @{hw}^2')

    print('== stage-0 block component ops ==')
    dim, hw = d0, s
    pr = {k: jnp.asarray(v) for k, v in rand_params(dim, 0).items()}
    p = PTree(pr)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, dim)) * 0.1, dt)
    x2 = jnp.asarray(rng.standard_normal((b, hw, hw, 2 * dim)) * 0.1, dt)
    hidden = int(1.5 * dim)
    xh = jnp.asarray(rng.standard_normal((b, hw, hw, 2 * hidden - dim)) * 0.1, dt)
    bench(lambda y: F.rms_norm_ref(y, pr['local.0.scale'], pr['local.0.offset']), x, 'rms_norm')
    bench(lambda y: p.conv('local.1', y)[..., :dim], x, '1x1 48->96 (crop back)')
    bench(lambda y: p.conv('local.2', y, padding=1, groups=dim), x2, '3x3 group(2ch) 96ch')
    bench(lambda y: y * p.conv('sca.1', jnp.mean(y, axis=(1, 2), keepdims=True)), x, 'SCA pool+1x1')
    from resselt_tpu.archs.mosrv2 import _inception_dwconv
    bench(lambda y: _inception_dwconv(p.sub('glob.token_mix'), y), xh, 'inception dw (id+hw+w+h)')

    enc_counts = (2, 2, 4, 6)
    dec_counts = (2, 2, 2, 2)
    est = sum(c * m for c, m in zip(enc_counts, stage_ms))
    # decoder blocks run at dim_i//2 == encoder widths, roughly symmetric
    est += sum(c * m for c, m in zip(dec_counts, reversed(stage_ms)))
    est += 10 * lat_ms
    print(f'\nestimated U-net total from stages: {est * 1e3:.1f} ms '
          f'(measured whole-model ~225 ms bf16)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
