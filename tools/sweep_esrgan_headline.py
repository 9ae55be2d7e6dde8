#!/usr/bin/env python
"""Re-sweep ESRGAN headline batch/tile after the producer-RDB change.

The round-2 sweep (BENCHMARKS.md) picked bf16 b16 @256 when the model ran
14.8 MP/s; the producer decomposition changed the shape mix (wider couts,
narrower cins), which can move the batch/tile sweet spot. Calibrated
on-device fori_loop + scalar readback per CLAUDE.md methodology.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

import resselt_tpu
from resselt_tpu.zoo import make_esrgan


def measure(model, b, t, s, dtype='bf16', target_s=2.0):
    params = model.params
    x = jnp.asarray(np.random.default_rng(0).random((b, t, t, 3), dtype=np.float32))
    if dtype == 'bf16':
        params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v) for k, v in params.items()}
        x = x.astype(jnp.bfloat16)
    apply_fn = functools.partial(model._apply_fn, model.config)

    @jax.jit
    def loop(p, x0, iters):
        def body(_, carry):
            y = apply_fn(p, carry)
            return carry + jnp.asarray(1e-6, carry.dtype) * y[:, :t, :t, :]

        out = jax.lax.fori_loop(0, iters, body, x0)
        return jnp.sum(out.astype(jnp.float32))

    float(loop(params, x, 1))  # compile + warm
    t0 = time.perf_counter()
    float(loop(params, x, 2))
    per = (time.perf_counter() - t0) / 2
    iters = max(2, int(round(target_s / per)))
    t0 = time.perf_counter()
    float(loop(params, x, iters))
    dt = time.perf_counter() - t0
    return (t * s) ** 2 * b * iters / 1e6 / dt


def main():
    s = 4
    sd = make_esrgan(num_filters=64, num_blocks=23, scale=s, seed=0)
    model = resselt_tpu.load_from_state_dict(sd)
    configs = [(16, 256), (24, 256), (32, 256), (8, 384), (16, 384), (32, 192), (48, 192), (8, 512)]
    for b, t in configs:
        try:
            mps = measure(model, b, t, s)
        except Exception as e:
            print(f'b{b} @{t}: FAILED {type(e).__name__}: {str(e)[:120]}', flush=True)
            continue
        print(f'b{b} @{t}: {mps:.2f} MP/s bf16', flush=True)


if __name__ == '__main__':
    main()
