#!/usr/bin/env python
"""DAT-S block anatomy at the tiled serving shape (t128 -> 160^2, b8 bf16).

VERDICT r3 #2: DAT's tiled bf16 row didn't move with chunked attention
(4.12 -> 4.14 MP/s) while the standalone b2 forward gained +19% and f32
tiled gained +19%.  This profiles every DATB sub-op at the EXACT serving
shape (160^2 window, tile_batch 8, bf16) the tiled scan runs, the way
profile_hat.py did for HAT: spatial attention (window branches, dwconv,
AIM), channel attention (XCiT einsums, norms), SGFN, and the
dispatch-boundary question (chunked vs fused at 8 * (160/8)*(160/16)=
1600 stacked windows).

    python tools/profile_dat.py [--win 160] [--batch 8] [--dtype bfloat16]
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
    print(f'{label:56s} {per_op * 1e3:8.3f} ms', flush=True)
    return per_op


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--win', type=int, default=160)  # serving window: t128 + 2*16
    ap.add_argument('--batch', type=int, default=8)  # loader tile_batch bf16
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
    from resselt.archs.dat.arch import DAT

    tm = DAT(img_size=64, embed_dim=180, split_size=[8, 16], depth=[6] * 6,
             num_heads=[6] * 6, expansion_factor=2.0, upscale=4,
             upsampler='pixelshuffle', resi_connection='1conv').eval()  # DAT-S
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
    del tm

    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.archs import dat as A
    from resselt_tpu.nn import functional as F
    from resselt_tpu.nn.params import PTree

    model = resselt_tpu.load_from_state_dict(sd)
    cfg = model.config
    p = PTree(model.params)
    heads = cfg.num_heads[0]
    print(f'cfg: dim={cfg.embed_dim} split={cfg.split_size} heads={heads}')

    dt = jnp.dtype(args.dtype)
    b, s = args.batch, args.win
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, s, s, cfg.embed_dim)) * 0.1, dt)
    sp = p.sub('layers.0.blocks.0')  # spatial block
    cp = p.sub('layers.0.blocks.1')  # channel block
    nwin = b * (s // cfg.split_size[0]) * (s // cfg.split_size[1])
    print(f'shape: {b}x{s}^2 {args.dtype}; stacked windows/branch: {nwin}')

    t_sp = bench(lambda y: A._datb(sp, y, cfg, heads, 0, 0), x, 'spatial DATB (norm+attn+SGFN)')
    t_ch = bench(lambda y: A._datb(cp, y, cfg, heads, 0, 1), x, 'channel DATB (norm+attn+SGFN)')
    print(f'-> layer pair {1e3 * (t_sp + t_ch):.3f} ms; '
          f'18 pairs/fwd ~= {18e3 * (t_sp + t_ch):.1f} ms model estimate')

    bench(lambda y: A._adaptive_spatial_attn(sp.sub('attn'), y, cfg, heads, False), x,
          '  spatial attn (unshifted)')
    bench(lambda y: A._adaptive_spatial_attn(sp.sub('attn'), y, cfg, heads, True), x,
          '  spatial attn (shifted)')
    bench(lambda y: A._adaptive_channel_attn(cp.sub('attn'), y, heads), x, '  channel attn')
    bench(lambda y: A._sgfn(sp.sub('ffn'), y, int(cfg.embed_dim * cfg.expansion_factor)), x,
          '  SGFN')

    # spatial-attention sub-steps
    ap_ = sp.sub('attn')
    c = cfg.embed_dim
    sp0, sp1 = cfg.split_size
    half, bh = c // 2, heads // 2

    bench(lambda y: F.linear(y, ap_['qkv.weight'], ap_.get('qkv.bias')), x, '    qkv projection')

    def branch(y):
        qkv = F.linear(y, ap_['qkv.weight'], ap_.get('qkv.bias'))
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        return A._spatial_branch(ap_.sub('attns.0'), q[..., :half], k[..., :half],
                                 v[..., :half], sp0, sp1, bh, None)

    bench(branch, x, '    qkv + one window branch (8x16)')

    def dwconv_branch(y):
        cx = ap_.conv('dwconv.0', y, padding=1, groups=c)
        return F.gelu(ap_.batch_norm('dwconv.1', cx))

    bench(dwconv_branch, x, '    dwconv branch (dw3x3+bn+gelu)')

    def aim(y):
        cm = jnp.mean(y, axis=(1, 2), keepdims=True)
        cm = ap_.conv('channel_interaction.1', cm)
        cm = F.gelu(ap_.batch_norm('channel_interaction.2', cm))
        cm = ap_.conv('channel_interaction.4', cm)
        sm = ap_.conv('spatial_interaction.0', y)
        sm = F.gelu(ap_.batch_norm('spatial_interaction.1', sm))
        sm = ap_.conv('spatial_interaction.3', sm)
        return y * F.sigmoid(cm) + F.sigmoid(sm) * y

    bench(aim, x, '    AIM (channel+spatial interaction)')
    bench(lambda y: F.linear(y, ap_['proj.weight'], ap_.get('proj.bias')), x, '    proj')

    # channel-attention sub-steps
    cap = cp.sub('attn')
    n = s * s

    def ch_einsums(y):
        xs = y.reshape(b, n, c)
        qkv = F.linear(xs, cap['qkv.weight'], cap.get('qkv.bias'))
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        hd = c // heads
        q = q.reshape(b, n, heads, hd).transpose(0, 2, 3, 1)
        k = k.reshape(b, n, heads, hd).transpose(0, 2, 3, 1)
        vt = v.reshape(b, n, heads, hd).transpose(0, 2, 3, 1)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum('bhdn,bhen->bhde', q, k,
                          preferred_element_type=jnp.float32).astype(y.dtype)
        attn = F.softmax(attn)
        out = jnp.einsum('bhde,bhen->bhdn', attn, vt,
                         preferred_element_type=jnp.float32).astype(y.dtype)
        return out.transpose(0, 3, 1, 2).reshape(b, s, s, c)

    bench(ch_einsums, x, '    channel qkv+norms+einsums')
    return 0


if __name__ == '__main__':
    sys.exit(main())
