#!/usr/bin/env python
"""Family perf sweep: EVERY registered architecture family measured on the
TPU chip at reference-default model sizes, with an MFU column.

    python tools/bench_families.py [--only SUBSTR] [--render-only]

Methodology (CLAUDE.md): on-device dependency-chained fori_loop with a
dynamic (device-scalar) iteration count, calibrated to >= 2 s of genuine
device work via a two-run delta that cancels the fixed per-dispatch
latency of the remote-TPU tunnel; scalar readback forces the sync.

Per row: f32 and bf16 MP/s (output megapixels; the whole network runs in
the input dtype), the XLA cost-analysis FLOPs of the compiled forward
(`SRModel.cost`), the implied useful TFLOP/s of the bf16 row, and MFU as
a percent of the 197-TFLOP v5e bf16 spec peak.  Measured attainable on
this chip: 164.5 TFLOP/s useful on a 128ch 3x3 conv = 83% of spec
(tools/peak_conv.py) — round 2's "64-TFLOP padded-MXU peak" was a
measurement artifact (latency-bound chained single matmuls).  MFU here is
a *diagnostic* for spotting pathological rows, not a roofline claim:
elementwise-dominated families are legitimately bandwidth-bound at
single-digit MFU.

Results accumulate in bench_families.json (resumable across tunnel
stalls); bench_families.md is re-rendered from the full JSON each run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
STATE = os.path.join(REPO, 'bench_families.json')
PEAK_TFLOPS = 197.0  # v5e bf16 spec peak; 164.5 measured attainable (tools/peak_conv.py)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _configs():
    """All 31 registered families, torch-reference constructors at
    reference-default sizes (SURVEY.md §2.2); tile/batch are the serving
    shapes used in round-2 measurements where those exist."""
    sys.path.insert(0, '/root/reference')
    import torch

    torch.set_grad_enabled(False)
    torch.manual_seed(0)

    from resselt.archs.atd.arch import ATD
    from resselt.archs.compact.arch import SRVGGNetCompact
    from resselt.archs.cugan.arch import UpCunet2x
    from resselt.archs.dat.arch import DAT
    from resselt.archs.drct.arch import DRCT
    from resselt.archs.eimn.arch import eimn
    from resselt.archs.esrgan.arch import RRDBNet
    from resselt.archs.fdat.arch import FDAT
    from resselt.archs.figsr.arch import FIGSR
    from resselt.archs.flexnet.arch import FlexNet
    from resselt.archs.gater.arch import GateR
    from resselt.archs.gaterv2.arch import GateRV2
    from resselt.archs.gaterv3.arch import GateRV3
    from resselt.archs.gfisr.arch import GFISR
    from resselt.archs.gfisrv2.arch import GFISRV2
    from resselt.archs.hat.arch import HAT
    from resselt.archs.lawfft.arch import LAWFFT
    from resselt.archs.moesr.arch import MoESR
    from resselt.archs.mosr.arch import mosr
    from resselt.archs.mosrv2.arch import MoSRv2
    from resselt.archs.omni.arch import OmniSR
    from resselt.archs.plksr.plksr import plksr
    from resselt.archs.rcan.arch import RCAN
    from resselt.archs.rgt.arch import RGT
    from resselt.archs.rha.arch import RHA
    from resselt.archs.rtmosr.arch import RTMoSR
    from resselt.archs.smosr.arch import SMoSR
    from resselt.archs.span.arch import SPAN
    from resselt.archs.spanplus.arch import SpanPlus
    from resselt.archs.spanpp.arch import SpanPP
    from resselt.archs.swinir.arch import SwinIR

    return {
        # conv families, 256px tiles, batch 8
        'span 4x': (lambda: SPAN(num_in_ch=3, num_out_ch=3), 256, 8),
        'spanplus 2x': (lambda: SpanPlus(blocks=[4], feature_channels=48, upscale=2, upsampler='ps'), 256, 8),
        'spanpp 2x': (lambda: SpanPP(), 256, 8),  # checkpoints always eval at base scale 2
        'compact 4x': (lambda: SRVGGNetCompact(num_feat=64, num_conv=16, upscale=4), 256, 8),
        'esrgan 4x': (lambda: RRDBNet(in_nc=3, out_nc=3, num_filters=64, num_blocks=23), 256, 8),
        'cugan 2x': (lambda: UpCunet2x(), 256, 8),
        'plksr 4x': (lambda: plksr(dim=64, n_blocks=28, upscaling_factor=4, kernel_size=17, split_ratio=0.25), 256, 8),
        'mosr 4x': (lambda: mosr(in_ch=3, upscale=4, n_block=24, dim=64, upsampler='ps'), 256, 8),
        'mosrv2 4x': (lambda: MoSRv2(), 256, 8),
        'smosr 4x': (lambda: SMoSR(scale=4), 256, 8),
        'moesr 4x': (lambda: MoESR(), 256, 8),
        'rtmosr 2x': (lambda: RTMoSR(), 256, 8),
        'eimn 4x': (lambda: eimn(), 256, 8),
        'rcan 4x': (lambda: RCAN(), 256, 8),
        'gfisr 4x': (lambda: GFISR(), 256, 8),
        'gfisrv2 4x': (lambda: GFISRV2(), 256, 8),
        'figsr 4x': (lambda: FIGSR(), 256, 8),
        # restoration U-nets (1x)
        'gater 1x': (lambda: GateR(), 256, 8),
        'gaterv2 1x': (lambda: GateRV2(), 256, 8),
        'gaterv3 1x': (lambda: GateRV3(), 256, 4),
        # hybrid / transformer families
        'rha 4x': (lambda: RHA(), 192, 4),
        'flexnet 4x': (lambda: FlexNet(), 192, 4),
        'omni 4x': (lambda: OmniSR(num_feat=64, block_num=1, pe=True, window_size=8, res_num=5, up_scale=4), 256, 8),
        'lawfft 4x': (lambda: LAWFFT(), 160, 4),
        'fdat-m 4x': (lambda: FDAT(), 160, 4),
        'swinir-m 4x': (lambda: SwinIR(
            img_size=64, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
            window_size=8, upsampler='pixelshuffle', upscale=4, img_range=1.0), 128, 1),
        'hat-s 4x': (lambda: HAT(
            img_size=64, embed_dim=144, depths=(6,) * 6, num_heads=(6,) * 6,
            window_size=16, compress_ratio=24, squeeze_factor=24, mlp_ratio=2.0,
            upsampler='pixelshuffle', upscale=4), 128, 8),
        'drct-l 4x': (lambda: DRCT(
            embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6, window_size=16,
            upscale=4, upsampler='pixelshuffle'), 160, 2),
        'dat-s 4x': (lambda: DAT(
            img_size=64, embed_dim=180, split_size=[8, 16], depth=[6] * 6,
            num_heads=[6] * 6, expansion_factor=2.0, upscale=4,
            upsampler='pixelshuffle', resi_connection='1conv'), 128, 2),
        'rgt 2x': (lambda: RGT(), 160, 2),
        'atd-light 4x': (lambda: ATD(
            embed_dim=48, depths=(6,) * 5, num_heads=(4,) * 5, window_size=16,
            category_size=128, num_tokens=64, reducted_dim=8, convffn_kernel_size=7,
            mlp_ratio=1, upsampler='pixelshuffledirect', upscale=4), 192, 2),
    }


from resselt_tpu.benchmark import measure_forward as measure  # noqa: E402


def render(state: dict, order) -> str:
    lines = [
        '# Family sweep: all 31 architecture families on the TPU chip',
        '',
        'Reference-default model sizes (torch constructors), calibrated',
        'on-device loop (tools/bench_families.py).  MFU = useful TFLOP/s of',
        'the bf16 row / 197-TFLOP v5e bf16 spec peak; measured attainable on',
        'this chip is 164.5 TFLOP/s on a 128ch 3x3 conv = 83% of spec',
        '(tools/peak_conv.py).  A diagnostic, not a roofline: elementwise-',
        'heavy families are legitimately bandwidth-bound at low MFU (notes).',
        '',
        '| model | tile | batch | f32 MP/s | bf16 MP/s | GFLOP/fwd | TFLOP/s (bf16) | MFU % |',
        '|---|---|---|---|---|---|---|---|',
    ]
    for name in order:
        r = state.get(name)
        if not r:
            lines.append(f'| {name} | - | - | - | - | - | - | - |')
            continue
        mfu = 100 * r['tflops_bf16'] / PEAK_TFLOPS  # recompute: cached rows may predate a peak fix
        lines.append(
            f'| {name} | {r["tile"]} | {r["batch"]} | {r["mps_f32"]:.1f} | '
            f'{r["mps_bf16"]:.1f} | {r["gflop"]:.1f} | {r["tflops_bf16"]:.1f} | '
            f'{mfu:.1f} |'
        )
    lines += [
        '',
        'Notes on the low-MFU rows (all re-measured standalone; outlier rule',
        'in CLAUDE.md):',
        '',
        '- **eimn (2.8%)**: per-op anatomy (tools/profile_eimn.py, 256²b8 f32:',
        '  1x1 conv 1.35 ms, plain 5x5 dw 1.60, dilated 5x5-d2+7x7-d3 pair',
        '  6.58, SAL@340ch 2.80, DFFM-global 0.25) — the dilated depthwise',
        '  pair is 40% of the block and runs at 0.35 TFLOP/s in every',
        '  formulation tried (XLA dilated, exact space-to-batch rewrite 6.58,',
        '  25-tap shifted-FMA 4.71): model-inherent VPU-bound depthwise work,',
        '  not an implementation artifact.  (This row supersedes round 2\'s',
        '  2.1 MP/s "EIMN" entry, which measured a ~3x larger non-default',
        '  construction.)',
        '- **gater f32 (2.9 vs 11.2 bf16)**: reproducible, not noise — the',
        '  GatedCNN 7x7 depthwise stacks pay a ~4x f32-vs-bf16 VPU penalty;',
        '  the serving path is bf16 (13% MFU there).',
        '- **gaterv2/v3**: rows reflect the grouped->block-diag-dense conv',
        '  rewrite (nn/functional.py): XLA ran their 2-channels-per-group',
        '  local.2 convs at 0.06 TFLOP/s (16 ms = 79% of a stage-0 block,',
        '  tools/profile_gaterv2.py); the dense-equivalent MXU form is',
        '  4.4-18x faster per conv -> gaterv2 3.3->7.3, gaterv3 2.3->5.7',
        '  bf16 MP/s (~2.2x whole-model, both dtypes).  GFLOP/fwd columns',
        '  count the dense FLOPs the compiled model now actually runs.',
        "- **atd (2.0%)**: round-2's \"sort-bound AC_MSA\" framing was",
        '  wrong — the argsort is free (0.013 ms); the (b, n, c) row',
        '  gather/scatter dominated it (1.5 of a 3.0 ms layer at 192^2',
        '  b2 bf16, tools/profile_atd.py).  Flattened (b*n, c) takes +',
        '  an int-scatter permutation inverse (tools/probe_gather.py)',
        '  run the shuffles 2.7x/6x faster (6.4 -> 8.0 f32 / 11.3 ->',
        '  12.5 bf16 MP/s); chunked attention (window branch + AC_MSA',
        '  group-axis chunks) added 8.0 -> 10.3 / 12.5 -> 14.2.',
        '- **chunked attention** (nn/window.py::use_chunked_attention):',
        '  XLA batched-attention fusion degrades past ~128 stacked',
        '  windows (tools/probe_rpe_gather.py, n=256 c=144 bf16: 2.2',
        '  us/window at 128 vs 4.45 at 512); chunking the window batch',
        '  to ~64 per einsum restores 1.9x bf16 / 2.5x f32 on the',
        '  attention core — exact math, no kernel.  Whole-model: hat',
        '  4.4->5.5 f32 / 7.0->8.8 bf16, drct 6.8->9.7 / 11.8->15.0,',
        '  dat-s 6.0->7.0 / 8.3->9.9, atd above; swinir (n=64, gated',
        '  off after a measured -7%), fdat, rgt neutral.',
        '- **omni**: row reflects the window-first channel-attention',
        '  rewrite (archs/omni.py::_channel_attn): the reference layout',
        '  puts window positions in the lane dim via 7-D transposes that',
        '  cost 15-19 ms each; partitioning windows first and contracting',
        '  tokens inside the einsums is 2.6-3.4x per attention',
        '  (tools/probe_omni_attn.py) -> 21.8->32.5 bf16 MP/s (+49%).',
        '  Remaining MFU is model-inherent: n=64 hd=16 window matmuls',
        '  (head-transpose-free einsum measured parity, probe_omni_wattn).',
        '- **FFT families (gfisr/gfisrv2/figsr/lawfft)**: rows reflect the',
        '  matmul-DFT path (nn/spectral.py) — rfft2/irfft2 as HIGHEST-',
        '  precision MXU matmuls, +8/+27/+29/+62% bf16 over jnp.fft.',
        '  lawfft remains low-MFU: its FSAS mixing is elementwise-heavy',
        '  and the cost model counts DFT matmuls as real FLOPs.',
        '- **dat-s**: the fused window-attention kernel is SUPERSEDED by',
        '  chunked attention as the default dispatch — its one admitted',
        '  regime (n=128, >=1024 windows) measured slower than chunked',
        '  XLA in bf16 (tiled 720p 4.13 vs 4.48 MP/s) and noise-tied f32',
        '  (tools/probe_dat_dispatch_tiled.py); it still serves as the',
        '  fallback when --no-chunked-attention is set.',
        '- **rha (9.8%)**: block anatomy (tools/profile_rha_rtmosr.py,',
        '  192^2 b4 bf16): fc1 64->192ch 3x3 runs 35 TFLOP/s and fc2',
        '  96->64 runs 16.6 — both AT the small-C padded-lane conv',
        '  ceiling (the closed k<=5 dense-packing line); the rest is the',
        '  down-8-pooled FLA attention + mish gates.  Model-inherent.',
        '- **rtmosr (7.1%)**: 2-block model — fc1/fc2/conv-path all at',
        '  the 32-80ch padded-conv rate (21-28 TFLOP/s) and only 142',
        '  GFLOP/fwd to amortize the unshuffle/pool/PS data movement.',
        '  Absolute rate is the 2nd-fastest bf16 row (208 MP/s).',
        '- **flexnet (5.1%)**: profiled, no single hotspot (tools/',
        '  profile_flexnet.py) — cost spread over dw convs, window attn',
        '  at n=64, and LayerNorms on a 48ch trunk.  Model-inherent.',
        '- **hat-s / fdat**: the round-3 "XLA formulation ceiling" was',
        '  the <=144-window regime only; chunked attention recovered the',
        '  large-batch degradation (HAB window branch + OCAB, both now',
        '  through the shared rectangular-kv multi_head_attention).  At',
        '  144 stacked windows the XLA attention block already runs at',
        '  ~1.2x the padded-MXU floor (0.336 vs 0.28 ms) — no room for',
        '  any fused/flash kernel there; that line stays closed.  fdat',
        '  (ws=8, n=64) is below the chunk gate and unchanged.',
    ]
    return '\n'.join(lines) + '\n'


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', default=None, help='substring filter on family names')
    ap.add_argument('--force', action='store_true', help='re-measure even if cached in JSON')
    ap.add_argument('--render-only', action='store_true')
    args = ap.parse_args(argv)

    try:
        from resselt_tpu.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    state = {}
    if os.path.exists(STATE):
        state = json.load(open(STATE))

    cfgs = _configs()
    if not args.render_only:
        import jax.numpy as jnp

        import resselt_tpu

        for name, (build, tile, batch) in cfgs.items():
            if args.only and args.only not in name:
                continue
            row0 = state.get(name)
            # a cached row is only valid for the SAME serving shape — a
            # config edit (tile/batch) must invalidate it, not serve stale
            if row0 and not args.force and (row0.get('tile'), row0.get('batch')) == (tile, batch):
                log(f'== {name} == cached ({row0["mps_bf16"]:.1f} bf16 MP/s)')
                continue
            log(f'== {name} ==')
            t0 = time.perf_counter()
            tm = build()
            sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
            del tm
            model = resselt_tpu.load_from_state_dict(sd)
            cost = model.cost(tile, tile, batch)
            gflop = cost['flops'] / 1e9
            log(f'  detected {model.arch_id}, {gflop:.1f} GFLOP/fwd @{tile}x{batch}')
            mps_f32, sec_f32, scale = measure(model, tile, batch)
            mps_bf16, sec_bf16, _ = measure(model, tile, batch, dtype=jnp.bfloat16)
            tflops = gflop / 1e3 / sec_bf16
            row = {
                'arch': model.arch_id, 'tile': tile, 'batch': batch, 'scale': scale,
                'mps_f32': round(mps_f32, 2), 'mps_bf16': round(mps_bf16, 2),
                'gflop': round(gflop, 1), 'tflops_bf16': round(tflops, 2),
                'mfu_pct': round(100 * tflops / PEAK_TFLOPS, 1),
                'sec_f32': round(sec_f32, 4), 'sec_bf16': round(sec_bf16, 4),
            }
            state[name] = row
            json.dump(state, open(STATE, 'w'), indent=1)
            log(f'  f32 {mps_f32:.1f} MP/s, bf16 {mps_bf16:.1f} MP/s, '
                f'{tflops:.1f} TFLOP/s = {row["mfu_pct"]:.1f}% MFU '
                f'({time.perf_counter() - t0:.0f}s)')

    out = render(state, list(cfgs.keys()))
    open(os.path.join(REPO, 'bench_families.md'), 'w').write(out)
    print(out)
    return 0


if __name__ == '__main__':
    sys.exit(main())
