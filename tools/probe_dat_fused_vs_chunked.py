#!/usr/bin/env python
"""DAT-S at 1024 stacked windows: fused Pallas window kernel vs chunked XLA.

The fused kernel's dispatch gate (ops/window_attention.py::supported)
requires batch*nW >= 1024 because below that XLA won; that comparison
predates the chunked-attention dispatch (nn/window.py), which beat the
unchunked XLA path by ~1.2x at DAT-S b2 (bench_families: 8.3 -> 9.86
bf16 MP/s).  This re-decides the >=1024-window regime: whole-model DAT-S
at 128^2 b8 (1024 windows) with the fused kernel ON (takes priority over
chunking) vs OFF (falls through to chunked XLA).

    python tools/probe_dat_fused_vs_chunked.py [--tile 128] [--batch 8]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--tile', type=int, default=128)
    ap.add_argument('--batch', type=int, default=8)
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
    from resselt_tpu.benchmark import measure_forward
    from resselt_tpu.nn import window as W

    model = resselt_tpu.load_from_state_dict(sd)
    t, b = args.tile, args.batch
    for dt in ('float32', 'bfloat16'):
        for fused in (True, False):
            W.use_fused_attention(fused)
            mps, sec, _ = measure_forward(model, t, b, dtype=dt)
            label = 'fused ' if fused else 'chunk '
            print(f'dat-s {t}^2 b{b} {dt:8s} {label}: {mps:.2f} MP/s ({sec * 1e3:.1f} ms)', flush=True)
    W.use_fused_attention(True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
