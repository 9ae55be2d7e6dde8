#!/usr/bin/env python
"""Checkpoint load-time comparison vs the torch reference.

The reference's ``Architecture.load`` constructs the full nn.Module —
running every init (e.g. trunc_normal_ over every Linear,
swinir/arch.py:925-934) — before ``load_state_dict`` overwrites the
weights (SURVEY.md §3.2).  This framework builds the param pytree straight
from the checkpoint.  Both sides run CPU-only (JAX_PLATFORMS=cpu) so the
comparison is Python+numpy work, not device transfer.

    python tools/bench_load.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=1')

import jax

jax.config.update('jax_platforms', 'cpu')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import torch


def build_checkpoints():
    from resselt_tpu.zoo import make_atd, make_esrgan, make_hat, make_swinir

    return {
        'esrgan-23 4x': make_esrgan(num_filters=64, num_blocks=23, scale=4),
        'swinir-m 4x': make_swinir(embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                                   window_size=8, upscale=4),
        'hat-s 4x': make_hat(embed_dim=144, depths=(6,) * 6, num_heads=(6,) * 6,
                             window_size=16, compress_ratio=24, squeeze_factor=24,
                             mlp_ratio=2.0, upscale=4, num_feat=64),
        'atd-light 4x': make_atd(embed_dim=48, depths=(6,) * 5, num_heads=(4,) * 5,
                                 window_size=16, num_tokens=64, reducted_dim=8,
                                 convffn_kernel_size=7, upscale=4),
    }


def main() -> int:
    import resselt_tpu

    sys.path.insert(0, '/root/reference')
    import resselt as resselt_ref

    rows = []
    for name, sd in build_checkpoints().items():
        tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

        t0 = time.perf_counter()
        ours = resselt_tpu.load_from_state_dict(sd)
        dt_ours = time.perf_counter() - t0

        t0 = time.perf_counter()
        ref = resselt_ref.load_from_state_dict(tsd)
        dt_ref = time.perf_counter() - t0

        del ref
        rows.append((name, ours.arch_id, dt_ours, dt_ref))
        print(f'{name:14s} ours {dt_ours * 1e3:8.1f} ms   reference {dt_ref * 1e3:8.1f} ms   '
              f'({dt_ref / dt_ours:.1f}x)', flush=True)

    print()
    print('| checkpoint | resselt_tpu load | reference load | speedup |')
    print('|---|---|---|---|')
    for name, _, a, b in rows:
        print(f'| {name} | {a * 1e3:.0f} ms | {b * 1e3:.0f} ms | **{b / a:.1f}x** |')
    return 0


if __name__ == '__main__':
    sys.exit(main())
