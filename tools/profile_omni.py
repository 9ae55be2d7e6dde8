#!/usr/bin/env python
"""OmniSR OSA-block anatomy on the TPU (family row: 21.8 bf16 MP/s, 1.2% MFU).

Times each sub-layer of the OSA block at the bench shapes (256^2 b8,
num_feat=64, ws=8, pe=True) with the calibrated amortized loop, to decide
whether the low MFU is model-inherent (tiny n=64 window matmuls) or an
implementation artifact.

    python tools/profile_omni.py [--tile 256] [--batch 8] [--dtype bfloat16]
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
    ap.add_argument('--tile', type=int, default=256)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    import sys as _s

    _s.path.insert(0, '/root/reference')
    import torch

    torch.set_grad_enabled(False)
    torch.manual_seed(0)
    from resselt.archs.omni.arch import OmniSR

    tm = OmniSR(num_feat=64, block_num=1, pe=True, window_size=8, res_num=5, up_scale=4)
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
    del tm

    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.archs import omni as O
    from resselt_tpu.nn.params import PTree

    model = resselt_tpu.load_from_state_dict(sd)
    cfg = model.config
    p = PTree(model.params)
    F = O.F

    dt = jnp.dtype(args.dtype)
    b, s = args.batch, args.tile
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, s, s, 64)) * 0.1, dt)

    bp = p.sub('residual_layer.0.residual_layer.0.layer')
    ws = cfg.window_size
    heads4 = 4

    print(f'== OSA sub-layers ({args.dtype}, {s}^2 b{b}) ==')
    bench(lambda y: O._mbconv(bp.sub('0'), y, 64), x, 'mbconv (layer.0)')

    def block_attn(y):
        q = bp.sub('2')
        xw, shape = O._block_windows(y, ws)
        z = F.layer_norm(xw, q['norm.weight'], q['norm.bias'])
        z = O._win_attention(q.sub('fn'), z, heads4, cfg.pe, ws)
        return O._block_unwindows(xw + z, ws, shape)

    def grid_attn(y):
        q = bp.sub('8')
        xw, shape = O._grid_windows(y, ws)
        z = F.layer_norm(xw, q['norm.weight'], q['norm.bias'])
        z = O._win_attention(q.sub('fn'), z, heads4, cfg.pe, ws)
        return O._grid_unwindows(xw + z, ws, shape)

    def win_only(y):
        xw, shape = O._block_windows(y, ws)
        return O._block_unwindows(xw, ws, shape)

    def gridwin_only(y):
        xw, shape = O._grid_windows(y, ws)
        return O._grid_unwindows(xw, ws, shape)

    bench(win_only, x, 'block window/unwindow only')
    bench(gridwin_only, x, 'grid window/unwindow only')
    bench(block_attn, x, 'block attention (win+attn+unwin)')
    bench(grid_attn, x, 'grid attention (win+attn+unwin)')
    bench(lambda y: O._channel_attn(bp.sub('5'), O._ln2d(bp.sub('5'), y), ws, 4, grid=False), x,
          'channel attention (layer.5)')
    bench(lambda y: O._channel_attn(bp.sub('11'), O._ln2d(bp.sub('11'), y), ws, 4, grid=True), x,
          'channel-grid attention (layer.11)')
    bench(lambda y: O._gcff(bp.sub('4'), O._ln2d(bp.sub('4'), y), 64), x, 'gated conv FFN (layer.4)')
    bench(lambda y: O._osa_block(p.sub('residual_layer.0.residual_layer.0'), y, cfg), x,
          'whole OSA block')
    bench(lambda y: O._esa(p.sub('residual_layer.0.esa'), y), x, 'ESA gate')
    return 0


if __name__ == '__main__':
    sys.exit(main())
