#!/usr/bin/env python
"""Tiny-cin head convs: XLA pads cin 3->128 PER TAP, so the RGB head conv
costs the same as a full 64->64 body conv (profile_compact.py: 0.94 ms
each at 256^2 b8 bf16).  An im2col-dot pays the K padding ONCE (27->128)
instead of 9 times: ~9x less padded MXU work.

    python tools/probe_head_conv.py

Measures standalone conv-vs-im2col at cin=3, then WHOLE-MODEL compact /
span / spanplus with the head conv monkeypatched (the standing lesson:
standalone op wins do not predict in-context gains).
"""

from __future__ import annotations

import functools
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


def im2col_conv3x3(x, w, b=None):
    """3x3 stride-1 'same' conv as patches @ matrix. w: OIHW."""
    import jax.numpy as jnp

    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3) for dx in range(3)], axis=-1)
    wmat = jnp.transpose(w, (2, 3, 1, 0)).reshape(9 * C, w.shape[0])
    y = patches @ wmat.astype(patches.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def main():
    import jax.numpy as jnp

    import resselt_tpu
    from resselt_tpu.nn import functional as F
    from resselt_tpu import zoo

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    rng = np.random.default_rng(0)
    b, t = 8, 256

    for dt, dname in [(jnp.bfloat16, 'bf16'), (jnp.float32, 'f32')]:
        x3 = jnp.asarray(rng.random((b, t, t, 3), np.float32)).astype(dt)
        w = jnp.asarray(rng.standard_normal((64, 3, 3, 3)).astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)

        # correctness first
        ref = np.asarray(F.conv2d(x3.astype(jnp.float32), w, bias, padding=1))
        got = np.asarray(im2col_conv3x3(x3.astype(jnp.float32), w, bias))
        err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-9)
        print(f'[{dname}] im2col exactness vs conv (f32): rel {err:.2e}')

        bench(lambda v: F.conv2d(v, w, bias, padding=1)[..., :3], x3,
              f'[{dname}] XLA conv 3->64 (crop)')
        bench(lambda v: im2col_conv3x3(v, w, bias)[..., :3], x3,
              f'[{dname}] im2col dot 3->64 (crop)')

    # whole-model: monkeypatch a head dispatch into F.conv2d
    orig_conv2d = F.conv2d

    def conv2d_headpatch(x, w, bb=None, stride=1, padding=0, dilation=1, groups=1):
        if (groups == 1 and w.shape[-2:] == (3, 3) and w.shape[1] <= 4
                and stride in (1, (1, 1)) and dilation in (1, (1, 1))
                and padding in (1, (1, 1), 'same')):
            return im2col_conv3x3(x, w, bb)
        return orig_conv2d(x, w, bb, stride=stride, padding=padding,
                           dilation=dilation, groups=groups)

    models = {
        'compact': zoo.make_compact(num_feat=64, num_conv=16, upscale=4),
        'span': zoo.make_span(),
        'spanplus': zoo.make_spanplus(),
    }
    for name, sd in models.items():
        model = resselt_tpu.load_from_state_dict(sd)
        apply_fn = functools.partial(model._apply_fn, model.config)
        x = jnp.asarray(rng.random((b, t, t, 3), np.float32)).astype(jnp.bfloat16)
        params = {k: jnp.asarray(v).astype(jnp.bfloat16)
                  if str(np.asarray(v).dtype) == 'float32' else jnp.asarray(v)
                  for k, v in model.params.items()}

        def whole(v):
            return apply_fn(params, v)[:, :t, :t, :]

        base = bench(whole, x, f'{name} WHOLE bf16 (XLA head)', reps=1)
        F.conv2d = conv2d_headpatch
        # span collapses Conv3XC at load; the runtime head conv is cin=3
        try:
            patched = bench(whole, x, f'{name} WHOLE bf16 (im2col head)', reps=1)
        finally:
            F.conv2d = orig_conv2d
        print(f'  -> {base / patched:.3f}x')


if __name__ == '__main__':
    main()
