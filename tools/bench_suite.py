#!/usr/bin/env python
"""Benchmark suite: every BASELINE.json config, measured on the TPU chip.

    python tools/bench_suite.py [--quick] [--skip-baseline]

Covers the five named configs (BASELINE.md):
  1. SPANPlus 2x on a 256x256 tile
  2. Compact + ESRGAN RRDBNet 4x (dense conv stacks)
  3. PLKSR / MoSR 4x (large-kernel / gated conv)
  4. SwinIR-M 4x (shifted-window attention)
  5. ATD-light 4x, overlap-tiled FHD input (hybrid attention, tiled driver)

TPU methodology: on-device dependency-chained fori_loop + scalar readback
(block_until_ready does not sync through the tunnel; see bench.py).  The
torch-CPU baseline runs the reference implementation per-MP at batch 1 and
is cached in .bench_suite_baseline.json.  Writes bench_suite.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from resselt_tpu.benchmark import PEAK_TFLOPS  # noqa: E402
CACHE = os.path.join(REPO, '.bench_suite_baseline.json')


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _torch_models(quick: bool):
    """Reference torch constructors per config (weights source + CPU baseline)."""
    sys.path.insert(0, '/root/reference')
    import torch

    torch.set_grad_enabled(False)
    torch.manual_seed(0)
    from resselt.archs.atd.arch import ATD
    from resselt.archs.compact.arch import SRVGGNetCompact
    from resselt.archs.dat.arch import DAT
    from resselt.archs.hat.arch import HAT
    from resselt.archs.mosr.arch import mosr
    from resselt.archs.plksr.plksr import plksr
    from resselt.archs.spanplus.arch import SpanPlus
    from resselt.archs.swinir.arch import SwinIR

    cfgs = {
        'spanplus 2x': dict(
            model=lambda: SpanPlus(blocks=[4], feature_channels=48, upscale=2, upsampler='ps'),
            scale=2, tile=256, batch=1,
        ),
        'compact 4x': dict(
            model=lambda: SRVGGNetCompact(num_feat=64, num_conv=16, upscale=4),
            scale=4, tile=256, batch=8,
        ),
        'plksr 4x': dict(
            model=lambda: plksr(dim=64, n_blocks=28, upscaling_factor=4, kernel_size=17, split_ratio=0.25),
            scale=4, tile=256, batch=8,
        ),
        'mosr 4x': dict(
            model=lambda: mosr(in_ch=3, upscale=4, n_block=24, dim=64, upsampler='ps'),
            scale=4, tile=256, batch=8,
        ),
        'swinir-m 4x': dict(
            model=lambda: SwinIR(
                img_size=64, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                window_size=8, upsampler='pixelshuffle', upscale=4, img_range=1.0,
            ),
            scale=4, tile=128, batch=1,
        ),
        'hat-s 4x tiled-HD': dict(
            model=lambda: HAT(
                img_size=64, embed_dim=144, depths=(6,) * 6, num_heads=(6,) * 6,
                window_size=16, compress_ratio=24, squeeze_factor=24, mlp_ratio=2.0,
                upsampler='pixelshuffle', upscale=4,
            ),
            # tile 192 + the loader's tile_batch 2 beat 128/b8 by 32-44%
            # (joint sweep, sweep_tiled.json)
            scale=4, tile=192, batch=1, tiled_input=(480, 640) if quick else (720, 1280),
        ),
        'dat-s 4x tiled-HD': dict(
            model=lambda: DAT(
                img_size=64, embed_dim=180, split_size=[8, 16], depth=[6] * 6,
                num_heads=[6] * 6, expansion_factor=2.0, upscale=4,
                upsampler='pixelshuffle', resi_connection='1conv',
            ),
            scale=4, tile=128, batch=1, tiled_input=(480, 640) if quick else (720, 1280),
        ),
        'atd-light 4x tiled-FHD': dict(
            model=lambda: ATD(
                embed_dim=48, depths=(6,) * 5, num_heads=(4,) * 5, window_size=16,
                category_size=128, num_tokens=64, reducted_dim=8, convffn_kernel_size=7,
                mlp_ratio=1, upsampler='pixelshuffledirect', upscale=4,
            ),
            scale=4, tile=160, batch=1, tiled_input=(544, 960) if quick else (1080, 1920),
        ),
    }

    # --- extra (non-BASELINE) serving rows ------------------------------
    # VERDICT-r4 #8: the tuned-halo fdat/swinir tiled serving numbers live
    # only in CLAUDE.md prose; carry them in the suite table.
    from resselt.archs.fdat.arch import FDAT

    cfgs['swinir-m 4x tiled-HD'] = dict(
        model=cfgs['swinir-m 4x']['model'], extra=True,
        scale=4, tile=128, batch=1, tiled_input=(480, 640) if quick else (720, 1280),
    )
    cfgs['fdat-m 4x tiled-HD'] = dict(
        model=lambda: FDAT(), extra=True,  # fdat-m defaults (bench_families row)
        scale=4, tile=128, batch=1, tiled_input=(480, 640) if quick else (720, 1280),
    )
    # VERDICT-r4 #3: BASELINE config 5 names "overlap-tiled 4K input"; the
    # FHD rows above never exercised the ~4x larger grid (bucketing, VMEM
    # at the serving batch, stitch cost).  Same models/hints, 3840x2160.
    for src, dst in (('hat-s 4x tiled-HD', 'hat-s 4x tiled-4K'),
                     ('dat-s 4x tiled-HD', 'dat-s 4x tiled-4K'),
                     ('atd-light 4x tiled-FHD', 'atd-light 4x tiled-4K')):
        c = dict(cfgs[src])
        c['tiled_input'] = (1080, 1920) if quick else (2160, 3840)
        c['extra'] = True
        c['baseline_key'] = src  # same model+tile: share the CPU baseline
        cfgs[dst] = c
    return cfgs


def _sd_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def measure_tpu(model, tile: int, scale: int, batch: int, dtype=None) -> float:
    """Calibrated on-device loop (shared methodology, resselt_tpu.benchmark)."""
    from resselt_tpu.benchmark import measure_forward

    mps, _, _ = measure_forward(model, tile, batch, dtype=dtype)
    return mps


def measure_tpu_tiled(model, hw: tuple[int, int], tile: int | None = None,
                      batch_size: int | None = None, dtype=None,
                      halo: int | None = None) -> float:
    """End-to-end tiled-driver throughput on a large input.

    Calibrated on-device loop around the driver's single-dispatch program
    (resselt_tpu.benchmark.measure_tiled) — validated against direct
    single-dispatch timing on all seven tiled families (agreement <= 3%,
    the cancelled per-dispatch tunnel latency; probe_tiled_loop.json).

    4K-class grids (> ~120 tile windows) use the direct-dispatch variant:
    the looped program reproducibly CRASHES the TPU worker at that scale
    (r5; the round-1 large-transformer-loop pathology), and at seconds per
    frame the per-dispatch latency is <2% anyway."""
    from resselt_tpu.benchmark import measure_tiled, measure_tiled_direct
    from resselt_tpu.parallel.tiling import (_plan_tiled, _resolve_halo_hint,
                                             _resolve_tile_hint)

    import jax.numpy as jnp

    eff = dtype if dtype is not None else jnp.float32
    if tile is None:  # per-dtype dict hints (swinir/rgt bf16 t160) resolve here
        tile = _resolve_tile_hint(model, eff)
    h = halo if halo is not None else _resolve_halo_hint(model, tile, eff)
    planned = _plan_tiled(model, hw[0], hw[1], tile, h, batch_size, eff, None)
    n_windows = len(planned[0].ys) * len(planned[0].xs) if planned else 0
    meas = measure_tiled_direct if n_windows > 120 else measure_tiled
    mps, _ = meas(model, hw, tile=tile, batch_size=batch_size, dtype=dtype,
                  halo=halo)
    return mps


def measure_torch_cpu(name: str, build, tile: int, scale: int) -> float:
    """Per-MP torch-CPU rate, cached by (name, tile)."""
    cached = {}
    if os.path.exists(CACHE):
        try:
            cached = json.load(open(CACHE))
        except Exception:
            cached = {}
    key = f'{name}@{tile}'
    if key in cached:
        log(f'  torch-cpu (cached): {cached[key]:.3f} MP/s')
        return cached[key]

    import torch

    m = build().eval()
    t = min(tile, 128)  # keep CPU baselines tractable; per-MP rate is size-stable
    x = torch.from_numpy(np.random.default_rng(0).random((1, 3, t, t), dtype=np.float32))
    with torch.inference_mode():
        m(x)
        t0 = time.perf_counter()
        m(x)
        dt = time.perf_counter() - t0
    mps = (t * scale) ** 2 / 1e6 / dt
    cached[key] = mps
    json.dump(cached, open(CACHE, 'w'))
    log(f'  torch-cpu: {mps:.3f} MP/s')
    return mps


def _enable_cache():
    """Enable the persistent XLA cache AND print a tunnel-health line
    (VERDICT-r4 #7): every bench/sweep tool shares this entry point, so a
    wedged axon worker produces a diagnostic instead of a silent hang.
    Health failure only warns — the main measurement may still succeed
    (transient wedges recover), and it has its own calibration guards."""
    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    if os.environ.get('RESSELT_SKIP_HEALTH'):
        return
    try:
        from tpu_health import check

        h = check(timeout_s=90.0)
        log(f'tpu_health: {json.dumps(h)}')
        if not h.get('ok'):
            log('tpu_health: WARNING — tunnel unhealthy; proceeding anyway')
    except Exception as e:
        log(f'tpu_health probe failed: {e}')


def main(argv=None) -> int:
    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true', help='smaller tiled input for the ATD row')
    ap.add_argument('--skip-baseline', action='store_true')
    ap.add_argument('--only', default=None, help='substring filter on config names')
    ap.add_argument('--fresh', action='store_true',
                    help='ignore the measured-row cache (.bench_suite_rows.json)')
    args = ap.parse_args(argv)

    import resselt_tpu

    # row-level resumability: a TPU worker crash mid-suite (the 4K hat row
    # took one down in r5) must not lose the rows already measured.  Keyed
    # on everything that changes the measured program; delete the file (or
    # pass --fresh) to force a re-measure.
    row_cache_path = os.path.join(REPO, '.bench_suite_rows.json')
    row_cache = {}
    if os.path.exists(row_cache_path) and not args.fresh:
        try:
            row_cache = json.load(open(row_cache_path))
        except Exception:
            row_cache = {}

    cfgs = _torch_models(args.quick)
    rows = []
    for name, c in cfgs.items():
        if args.only and args.only not in name:
            continue
        log(f'== {name} ==')
        tm = c['model']()
        model = resselt_tpu.load_from_state_dict(_sd_numpy(tm))
        tile_flops = model.cost(c['tile'], c['tile'])['flops']
        log(f'  detected {model.arch_id}, {tile_flops / 1e9:.1f} GFLOP @tile')
        t0 = time.perf_counter()
        mps_bf16 = None
        if 'tiled_input' in c:
            # tiled rows run at the loader's tile_batch (dtype-resolved in
            # parallel/tiling.py); surface it in the batch column
            tb = getattr(model, 'tile_batch', None) or 8
            c['batch'] = f"{tb.get('f32', 8)}/{tb.get('bf16', 8)}" if isinstance(tb, dict) else tb
            import jax.numpy as jnp

            from resselt_tpu.parallel.tiling import _resolve_tile_hint
            t32 = _resolve_tile_hint(model, jnp.float32)
            t16 = _resolve_tile_hint(model, jnp.bfloat16)
            # display shows a per-dtype split as "t32/t16"; c['tile'] stays
            # an int (cost analysis + CPU-baseline cache key use it)
            c['tile_display'] = t32 if t32 == t16 else f'{t32}/{t16}'
            rkey = json.dumps([name, [t32, t16], str(c['batch']),
                               list(c.get('tiled_input', ())),
                               model.serving_halo if not isinstance(model.serving_halo, dict)
                               else sorted(model.serving_halo.items())])
            if rkey in row_cache:
                mps, mps_bf16 = row_cache[rkey]
                log(f'  (row cache hit)')
            else:
                mps = measure_tpu_tiled(model, c['tiled_input'])
                # bf16 is the recommended serving path (quality gated by the
                # per-family column in parity_report.md)
                mps_bf16 = measure_tpu_tiled(model, c['tiled_input'],
                                             dtype=jnp.bfloat16)
        else:
            rkey = json.dumps([name, c['tile'], c['batch']])
            import jax.numpy as jnp

            if rkey in row_cache:
                mps, mps_bf16 = row_cache[rkey]
                log(f'  (row cache hit)')
            else:
                mps = measure_tpu(model, c['tile'], c['scale'], c['batch'])
                # bf16 is the recommended serving dtype — every row gets both
                # columns (VERDICT r3 weak #4)
                mps_bf16 = measure_tpu(model, c['tile'], c['scale'], c['batch'],
                                       dtype=jnp.bfloat16)
        if rkey not in row_cache:
            row_cache[rkey] = [mps, mps_bf16]
            tmp = row_cache_path + '.tmp'
            json.dump(row_cache, open(tmp, 'w'), indent=1)
            os.replace(tmp, row_cache_path)
        log(f'  tpu: {mps:.2f} MP/s f32'
            + (f', {mps_bf16:.2f} bf16' if mps_bf16 else '')
            + f' (measured in {time.perf_counter() - t0:.0f}s)')
        bkey = c.get('baseline_key', name)
        if args.skip_baseline:
            # cached baselines still populate the table; skip only MEASURING
            cached = {}
            if os.path.exists(CACHE):
                try:
                    cached = json.load(open(CACHE))
                except Exception:
                    cached = {}
            base = cached.get(f'{bkey}@{c["tile"]}')
        else:
            base = measure_torch_cpu(bkey, c['model'], c['tile'], c['scale'])
        rows.append((name, c, mps, mps_bf16, base, tile_flops))

    lines = [
        '# bench_suite results (BASELINE.json configs, TPU v5e chip)',
        '',
        '| config | tile/input | batch | TPU MP/s f32 | TPU MP/s bf16 | TFLOP/s | MFU % | torch-CPU MP/s | speedup (f32) |',
        '|---|---|---|---|---|---|---|---|---|',
    ]
    for name, c, mps, mps_bf16, base, tile_flops in rows:
        if c.get('extra'):
            name = name + ' *'
        size = (f'{c["tiled_input"][1]}x{c["tiled_input"][0]} tiled '
                f'{c.get("tile_display", c["tile"])}') if 'tiled_input' in c else str(c['tile'])
        sp = f'{mps / base:.0f}x' if base else '-'
        bs = f'{base:.3f}' if base else '-'
        b16 = f'{mps_bf16:.2f}' if mps_bf16 else '-'
        # useful TFLOP/s from the best measured rate and the per-tile XLA
        # cost analysis; MFU vs the 197-TFLOP v5e bf16 spec peak (the
        # round-3 peak correction rescinded the old 64-TFLOP figure; chip
        # delivers 164.5 measured, tools/peak_conv.py).  For tiled rows
        # this slightly understates FLOP/s (halo recompute is not
        # counted), which is the honest direction for a utilization column.
        flops_per_out_mp = tile_flops / ((c['tile'] * c['scale']) ** 2 / 1e6)
        tflops = (mps_bf16 or mps) * flops_per_out_mp / 1e12
        lines.append(
            f'| {name} | {size} | {c["batch"]} | {mps:.2f} | {b16} | '
            f'{tflops:.1f} | {100 * tflops / PEAK_TFLOPS:.1f} | {bs} | **{sp}** |'
        )
    lines.append('')
    lines.append('`*` = extra serving rows beyond the five BASELINE configs '
                 '(VERDICT-r4 #3/#8: tuned-halo fdat/swinir-tiled, and the '
                 '4K overlap-tiled grid BASELINE.md:29 names for config 5).')
    out = '\n'.join(lines) + '\n'
    if not (args.only or args.quick):  # partial/reduced runs must not clobber the full table
        open(os.path.join(REPO, 'bench_suite.md'), 'w').write(out)
    print(out)
    return 0


if __name__ == '__main__':
    sys.exit(main())
