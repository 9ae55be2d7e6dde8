#!/usr/bin/env python
"""DAT-S serving dispatch at >=1024 stacked windows: fused kernel vs
chunked XLA, measured on the REAL serving path (benchmark.measure_tiled
over parallel.tiling.tiled_program — the exact program upscale_tiled
serves; known crash-free with the fused kernel in its scan body).

Context: probe_dat_fused_vs_chunked.py (measure_forward's whole-model
fori_loop at b8) CRASHED the TPU worker before producing a number; this
variant answers the same dispatch question without that construction.

    python tools/probe_dat_dispatch_tiled.py [--height 720] [--width 1280]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--height', type=int, default=720)
    ap.add_argument('--width', type=int, default=1280)
    ap.add_argument('--tile', type=int, default=128)
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
             upsampler='pixelshuffle', resi_connection='1conv')
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
    del tm

    import resselt_tpu
    from resselt_tpu.benchmark import measure_tiled
    from resselt_tpu.nn import window as W

    import jax.numpy as jnp

    model = resselt_tpu.load_from_state_dict(sd)
    hw = (args.height, args.width)
    for name, dt in (('f32', jnp.float32), ('bf16', jnp.bfloat16)):
        for fused in (True, False):
            W.use_fused_attention(fused)
            mps, sec = measure_tiled(model, hw, tile=args.tile, dtype=dt)
            label = 'fused' if fused else 'chunk'
            print(f'dat-s tiled {hw} t{args.tile} {name:4s} {label}: '
                  f'{mps:.2f} MP/s ({sec * 1e3:.0f} ms/frame)', flush=True)
    W.use_fused_attention(True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
