#!/usr/bin/env python
"""HAT-S block anatomy at the family-table serving shape (128^2 b8 bf16,
7.0 MP/s, 6.1% MFU): HAB (window attention + CAB + MLP), OCAB, per-op.

    python tools/profile_hat.py [--tile 128] [--batch 8] [--dtype bfloat16]
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
    ap.add_argument('--tile', type=int, default=128)
    ap.add_argument('--batch', type=int, default=8)
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
    from resselt.archs.hat.arch import HAT

    tm = HAT(img_size=64, embed_dim=144, depths=(6,) * 6, num_heads=(6,) * 6,
             window_size=16, compress_ratio=24, squeeze_factor=24, mlp_ratio=2.0,
             upsampler='pixelshuffle', upscale=4)  # HAT-S as in bench_families
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
    del tm

    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.archs import hat as H
    from resselt_tpu.nn.params import PTree

    model = resselt_tpu.load_from_state_dict(sd)
    cfg = model.config
    p = PTree(model.params)
    print(f'cfg: dim={cfg.embed_dim} ws={cfg.window_size} owin={cfg.overlap_win_size}')

    import numpy as onp

    dt = jnp.dtype(args.dtype)
    b, s = args.batch, args.tile
    rng = onp.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, s, s, cfg.embed_dim)) * 0.1, dt)

    bp = p.sub('layers.0.residual_group.blocks.0')
    op = p.sub('layers.0.residual_group.overlap_attn')
    rpi_sa_arr = p['relative_position_index_SA']
    rpi_oca_arr = p['relative_position_index_OCA']

    heads = 6
    bench(lambda y: H._hab(bp, y, cfg, heads, 0, rpi_sa_arr), x, 'HAB (shift 0)')
    bench(lambda y: H._hab(p.sub('layers.0.residual_group.blocks.1'), y, cfg, heads,
                           cfg.window_size // 2, rpi_sa_arr), x, 'HAB (shifted)')
    bench(lambda y: H._ocab(op, y, cfg, heads, rpi_oca_arr), x, 'OCAB')
    bench(lambda y: H._cab(bp.sub('conv_block'), y, cfg.embed_dim, cfg), x, 'CAB only')

    def wattn_only(y):
        from resselt_tpu.nn.window import window_partition, window_reverse

        ws = cfg.window_size
        windows = window_partition(y, ws)
        a = H._window_attn(bp.sub('attn'), windows, rpi_sa_arr, heads, ws * ws, None)
        return window_reverse(a, ws, s, s)

    bench(wattn_only, x, 'window attention only')

    def mlp_only(y):
        import resselt_tpu.nn.functional as F

        z = F.layer_norm(y, bp['norm2.weight'], bp['norm2.bias'])
        return bp.linear('mlp.fc2', F.gelu(bp.linear('mlp.fc1', z)))

    bench(mlp_only, x, 'LN + MLP only')

    def ocab_patches(y):
        return H._overlap_windows(jnp.concatenate([y, y], axis=-1), cfg.window_size,
                                  cfg.overlap_win_size).reshape(b, s, s, -1)[..., : cfg.embed_dim]

    bench(ocab_patches, x, 'OCAB overlap-window assembly only')
    return 0


if __name__ == '__main__':
    sys.exit(main())
