#!/usr/bin/env python
"""Re-probe SwinIR-M batch scaling with the calibrated-loop methodology.

Round 1 concluded "B=4 is 2x WORSE per-MP than B=1 (VMEM pressure)" and the
family table pinned swinir-m at tile 128 batch 1, where bf16 measures the
same as f32 (12.7 vs 12.8 MP/s) — both smell like the old single-dispatch
methodology. One clean sweep: batch x {1,2,4,8} x dtype at 128^2, plus a
64^2 high-batch point (more stacked windows per dispatch).
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, '/root/reference')

from bench_families import measure  # noqa: E402  (tools/ on path via __main__)

import resselt_tpu  # noqa: E402


def main():
    torch.set_grad_enabled(False)
    torch.manual_seed(0)
    from resselt.archs.swinir.arch import SwinIR

    m = SwinIR(img_size=64, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
               window_size=8, upsampler='pixelshuffle', upscale=4, img_range=1.0)
    sd = {k: v for k, v in m.state_dict().items()}
    model = resselt_tpu.load_from_state_dict(sd)

    cases = [(128, 1, None), (128, 1, jnp.bfloat16), (128, 4, jnp.bfloat16),
             (128, 8, jnp.bfloat16), (64, 16, jnp.bfloat16), (128, 4, None)]
    for tile, batch, dt in cases:
        for _ in [0]:
            name = 'bf16' if dt is not None else 'f32 '
            try:
                mps, per, _ = measure(model, tile, batch, dtype=dt)
                print(f'{name} tile {tile:3d} b{batch:<2d}: {mps:6.2f} MP/s ({per * 1e3:7.1f} ms/fwd)', flush=True)
            except Exception as e:
                print(f'{name} tile {tile:3d} b{batch:<2d}: FAILED {type(e).__name__}: {str(e)[:100]}', flush=True)


if __name__ == '__main__':
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    main()
