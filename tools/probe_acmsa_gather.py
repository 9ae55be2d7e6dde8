#!/usr/bin/env python
"""Feasibility probe for a VMEM-resident AC_MSA data-movement kernel (ATD).

VERDICT r3 #3 asks whether a Pallas kernel holding the sorted (b*n, 3c)
rows VMEM-resident across gather -> grouped attention -> unsort can beat
XLA's three HBM round-trips.  The kernel's fate is decided by one number:
the achievable per-row DMA rate for an INDEXED row gather.

Arithmetic that frames the measurement:
- An AC_MSA row is 3c = 144 floats = 576 B f32 (ATD-light c=48).  The
  minimum legal DMA granularity on this chip is an (8, 128) tile (CLAUDE.md
  round-3 crash findings: sublane offsets and extents must be multiples of
  8, lanes of 128) = 4 KB f32 -> 3.5x byte inflation per gathered row.
- Rows land at sort-order-random source offsets, so each row is its own
  DMA: n = tile_h * tile_w DMAs per layer per tile (36864 at t192).  At
  any plausible DMA issue cost (0.05-1 us) that is 1.8-37 ms per gather
  pass vs XLA's measured 0.21 ms `take` (probe_gather.py, 192^2 b2 bf16).

This probe measures the actual per-row rate of a minimal scalar-prefetch
row-gather kernel (one aligned (8,128)-tile DMA per row, BLK rows per grid
step, all BLK DMAs in flight on one semaphore) against XLA's flattened
take on the same index set, plus the XLA whole-shuffle-chain baseline.

    python tools/probe_acmsa_gather.py [--rows 8192] [--blk 64] [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def _gather_kernel(idx_ref, src_hbm, out_ref, sem, *, blk: int):
    i = pl.program_id(0)
    copies = []
    for j in range(blk):
        r = idx_ref[i * blk + j]
        c = pltpu.make_async_copy(
            src_hbm.at[pl.ds(r * 8, 8)], out_ref.at[pl.ds(j * 8, 8)], sem
        )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()


def tile_gather(src, idx, blk: int, interpret: bool = False):
    """Gather rows of ``src`` (n*8, 128) by tile index: out[j] = src[idx[j]].

    Each logical row occupies an aligned (8, 128) f32 tile; one DMA per row.
    """
    import jax

    n = idx.shape[0]
    assert n % blk == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // blk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM)],
        out_specs=pl.BlockSpec((blk * 8, 128), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, blk=blk),
        out_shape=jax.ShapeDtypeStruct((n * 8, 128), src.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, src)


def bench_scalar_loop(fn, dep_arg, label, min_seconds=1.5):
    """Calibrated on-device loop; dependency threaded through the int32 arg."""
    import jax
    import jax.numpy as jnp

    from resselt_tpu.benchmark import calibrated_per_iter

    @jax.jit
    def loop(dep0, n):
        def body(_, dep):
            y = fn(dep)
            return dep + (y.flatten()[0] * 0).astype(dep.dtype)

        out = jax.lax.fori_loop(0, n, body, dep0)
        return jnp.sum(out.astype(jnp.float32))

    float(loop(dep_arg, jnp.int32(1)))

    def run(n):
        t0 = time.perf_counter()
        float(loop(dep_arg, jnp.int32(n)))
        return time.perf_counter() - t0

    per = calibrated_per_iter(run, 2, min_seconds)
    print(f'{label:56s} {per * 1e3:9.4f} ms', flush=True)
    return per


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=8192)
    ap.add_argument('--blk', type=int, default=64)
    ap.add_argument('--interpret', action='store_true')
    args = ap.parse_args(argv)

    global pl, pltpu
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    globals()['pl'] = pl
    globals()['pltpu'] = pltpu

    n, blk = args.rows, args.blk
    rng = np.random.default_rng(0)
    perm = rng.permutation(n).astype(np.int32)
    src = jnp.asarray(rng.random((n * 8, 128), dtype=np.float32))
    idx = jnp.asarray(perm)

    # exactness (interpret on CPU; compiled on TPU)
    got = np.asarray(tile_gather(src, idx, blk, interpret=args.interpret))
    want = np.asarray(src).reshape(n, 8, 128)[perm].reshape(n * 8, 128)
    err = np.abs(got - want).max()
    print(f'tile_gather exact: max err {err}')
    assert err == 0.0

    if args.interpret:
        return 0

    # rate: XLA flattened take (the shipped formulation, archs/atd.py)
    # FIRST — the pallas kernel has crashed the TPU worker once, and a
    # crash mid-probe must not cost the baselines.
    rows288 = jnp.asarray(rng.random((n, 288), dtype=np.float32))
    per_x = bench_scalar_loop(lambda d: jnp.take(rows288, d, axis=0), idx,
                              f'XLA take {n} rows x 288 f32 (shipped)')
    print(f'  -> {per_x / n * 1e9:.1f} ns/row, {n * 1152 / per_x / 1e9:.1f} GB/s payload')

    rows_b = rows288.astype(jnp.bfloat16)
    per_xb = bench_scalar_loop(lambda d: jnp.take(rows_b, d, axis=0), idx,
                               f'XLA take {n} rows x 288 bf16 (shipped)')
    print(f'  -> {per_xb / n * 1e9:.1f} ns/row')

    per = bench_scalar_loop(lambda d: tile_gather(src, d, blk), idx,
                            f'pallas tile-gather {n} rows (BLK={blk})')
    print(f'  -> {per / n * 1e9:.1f} ns/row, {n * 4096 / per / 1e9:.1f} GB/s moved')

    print()
    ratio = per / per_x
    print(f'pallas/XLA per-row ratio: {ratio:.2f}x '
          f'({"kernel DEAD: XLA take is faster per row" if ratio > 0.8 else "kernel plausible"})')
    return 0


if __name__ == '__main__':
    sys.exit(main())
