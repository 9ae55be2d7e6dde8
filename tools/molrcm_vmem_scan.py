#!/usr/bin/env python
"""Compile-only scoped-VMEM scan for the fused MOLRCM kernel.

AOT-compiles the loop-wrapped fused call (the shape bench() uses) for a
set of channel-group sizes and reports scoped-VMEM fit — compile errors
are safe (the chip never runs anything), so this is the cheap way to find
a config under the 16 MB limit before any hardware run.
"""

from __future__ import annotations

import re
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

from probe_molrcm import make_params  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from resselt_tpu.ops import molrcm as M

    d = 64
    rng = np.random.default_rng(0)
    p = make_params(d, rng)
    x = jnp.asarray(rng.standard_normal((8, 256, 256, d), np.float32) * 0.3)

    def report(label, fn, *args):
        try:
            fn.lower(*args).compile()
            print(f'{label}: FITS', flush=True)
        except Exception as e:
            m = re.search(r'size ([0-9.]+)M and limit ([0-9.]+)M', str(e))
            if m:
                print(f'{label}: scoped {m.group(1)}M (limit {m.group(2)}M)', flush=True)
            else:
                print(f'{label}: {type(e).__name__}: {str(e)[:200]}', flush=True)

    for cg in (64, 16):
        @jax.jit
        def loop(x0, n, cg=cg):
            def body(_, y):
                return y + jnp.asarray(1e-6, y.dtype) * M.fused_molrcm(p, y, d, cg=cg)

            return jnp.sum(jax.lax.fori_loop(0, n, body, x0).astype(jnp.float32))

        @jax.jit
        def chain(y, cg=cg):
            for _ in range(4):
                y = y + jnp.asarray(1e-6, y.dtype) * M.fused_molrcm(p, y, d, cg=cg)
            return y

        report(f'loop  cg={cg}', loop, x, jnp.int32(2))
        report(f'chain cg={cg}', chain, x)


if __name__ == '__main__':
    main()
