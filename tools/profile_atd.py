#!/usr/bin/env python
"""ATD layer anatomy at the serving shape (192^2 b2 bf16, 11.3 MP/s, 1.6%
MFU): window attention vs ATD_CA vs AC_MSA (argmax/sort/gather/scatter) vs
ConvFFN, plus AC_MSA sub-steps.

    python tools/profile_atd.py [--tile 192] [--batch 2] [--dtype bfloat16]
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
    print(f'{label:48s} {per_op * 1e3:8.3f} ms', flush=True)
    return per_op


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--tile', type=int, default=192)
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
    from resselt.archs.atd.arch import ATD

    tm = ATD(embed_dim=48, depths=(6, 6, 6, 6), num_heads=(4, 4, 4, 4), window_size=16,
             category_size=128, num_tokens=64, reducted_dim=8, convffn_kernel_size=5,
             mlp_ratio=1, upsampler='pixelshuffledirect', upscale=4)  # ATD-light
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
    del tm

    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.archs import atd as A
    from resselt_tpu.nn import functional as F
    from resselt_tpu.nn.params import PTree

    model = resselt_tpu.load_from_state_dict(sd)
    cfg = model.config
    p = PTree(model.params)
    print(f'cfg: dim={cfg.embed_dim} ws={cfg.window_size} cat={cfg.category_size} T={cfg.num_tokens}')

    dt = jnp.dtype(args.dtype)
    b, s = args.batch, args.tile
    n = s * s
    c = cfg.embed_dim
    heads = 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, c)) * 0.1, dt)
    lp = p.sub('layers.0.residual_group.layers.0')
    td = jnp.asarray(rng.standard_normal((b, cfg.num_tokens, c)) * 0.1, dt)
    rpi = p['relative_position_index_SA'] if 'relative_position_index_SA' in p.keys() else None

    def layer(y):
        import numpy as onp

        rpi_arr = A._calc_rpi_sa(cfg.window_size) if hasattr(A, '_calc_rpi_sa') else None
        out, _ = A._atd_layer(lp, y, td, cfg, heads, 0, rpi_loc, False, s, s)
        return out

    # rpi: from the model params (registered buffer)
    keys = [k for k in model.params if 'relative_position_index' in k]
    rpi_loc = model.params[keys[0]]
    print('rpi key:', keys[0])

    bench(lambda y: A._atd_layer(lp, y, td, cfg, heads, 0, rpi_loc, False, s, s)[0], x,
          'whole ATD layer (shift 0)')
    bench(lambda y: A._atd_ca(lp.sub('attn_atd'), y, td, cfg.num_tokens)[0], x, 'ATD_CA only')

    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)) * 0.1, dt)
    sim = jnp.asarray(rng.standard_normal((b, n, cfg.num_tokens)), jnp.float32)
    sim = F.softmax(sim)

    def acmsa_only(y):
        out = A._ac_msa(lp.sub('attn_aca'), jnp.concatenate([y, y, y], axis=-1), sim, heads,
                        cfg.category_size)
        return out

    bench(acmsa_only, x, 'AC_MSA (argmax+sort+gather+MSA+scatter)')

    tk_id = jnp.argmax(sim, axis=-1)

    def sort_only(y):
        si = jnp.argsort(tk_id + jnp.mean(y).astype(jnp.int32) * 0, axis=-1, stable=True)
        return y * 0 + si[..., None].astype(y.dtype) * 1e-6

    bench(sort_only, x, '  argsort only')

    def sort_gather(y):
        si = jnp.argsort(tk_id, axis=-1, stable=True)
        sh = jnp.take_along_axis(jnp.concatenate([y, y, y], axis=-1), si[..., None], axis=1)
        return sh[..., :c]

    bench(sort_gather, x, '  argsort + qkv gather')

    def scatter_only(y):
        si = jnp.argsort(tk_id, axis=-1, stable=True)
        out = jnp.zeros_like(y).at[jnp.arange(b)[:, None], si].set(y)
        return out

    bench(scatter_only, x, '  argsort + scatter unsort')

    def win_attn(y):
        from resselt_tpu.nn.window import window_partition, window_reverse

        ws = cfg.window_size
        img = jnp.concatenate([y, y, y], axis=-1).reshape(b, s, s, 3 * c)
        windows = window_partition(img, ws)
        aw = A._attn_win(lp.sub('attn_win'), windows, rpi_loc, heads, ws * ws, None)
        return window_reverse(aw, ws, s, s).reshape(b, n, c)

    bench(win_attn, x, 'window attention branch')
    bench(lambda y: A._convffn(lp.sub('convffn'), y, s, s, cfg.convffn_kernel_size), x, 'ConvFFN')
    return 0


if __name__ == '__main__':
    sys.exit(main())
