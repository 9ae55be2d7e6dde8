"""Command-line upscaler.

    python -m resselt_tpu.upscale MODEL INPUT OUTPUT [--tile 256] [--halo 16]

``INPUT``/``OUTPUT`` may be single images or directories (batch mode).
``MODEL`` is any supported checkpoint, or a ``.npz`` cache written by
``resselt_tpu.cache``/``python -m resselt_tpu.convert``.

The reference ships no CLI (SURVEY.md §0); this is the end-to-end driver:
checkpoint -> detection -> jit-compiled inference (tiled for large inputs)
-> image out, with structured logging of the detection result and optional
jax profiler traces.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import numpy as np

logger = logging.getLogger('resselt_tpu')

IMAGE_EXTS = ('.png', '.jpg', '.jpeg', '.bmp', '.webp', '.tif', '.tiff')


def load_image(path: str) -> np.ndarray:
    """Load as float [0,1] HWC; RGBA stays 4-channel, everything else RGB."""
    from PIL import Image

    img = Image.open(path)
    if img.mode in ('RGBA', 'LA', 'PA'):
        img = img.convert('RGBA')
    else:
        img = img.convert('RGB')
    return np.asarray(img, dtype=np.float32) / 255.0


def save_image(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def adapt_channels(img: np.ndarray, c_in: int):
    """Split an image into model-input planes for a ``c_in``-channel model.

    Returns (main, alpha_or_None): RGBA images run their alpha through the
    model as a separate replicated-gray pass (chaiNNer-style); grayscale
    models get the ITU-R luma of color inputs."""
    has_alpha = img.shape[-1] == 4
    rgb = img[..., :3]
    alpha = img[..., 3:4] if has_alpha else None
    if c_in == 4:
        if not has_alpha:
            img = np.concatenate([rgb, np.ones_like(rgb[..., :1])], axis=-1)
        return img, None
    if c_in == 1:
        luma = rgb @ np.asarray([0.299, 0.587, 0.114], np.float32)
        return luma[..., None], alpha
    if c_in == 3:
        return rgb, alpha
    raise ValueError(f'cannot adapt a {img.shape[-1]}-channel image to a {c_in}-channel model')


def load_model(path: str):
    import resselt_tpu

    if path.endswith('.npz'):
        from resselt_tpu.cache import load_model as load_cached

        return load_cached(path)
    return resselt_tpu.load_from_file(path)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description='Upscale image(s) with an auto-detected SR model.')
    parser.add_argument('model', help='checkpoint file (.pth/.pt/.ckpt/.safetensors) or .npz cache')
    parser.add_argument('input', help='input image or directory')
    parser.add_argument('output', help='output image or directory')
    parser.add_argument('--tile', default='0',
                        help="tile size for tiled inference (0 = whole image; 'auto' = the "
                             "arch's measured sweet spot, e.g. transformers 128-192)")
    parser.add_argument('--scale', type=int, default=None,
                        help='pick a scale on an arbitrary-scale checkpoint (SpanPP '
                             'IGConv trains one tail per scale; default = base scale)')
    parser.add_argument('--halo', type=int, default=None,
                        help='tile halo/overlap (default: the arch\'s measured '
                             'seam-parity-gated sweet spot at its swept tile; any '
                             'other --tile derives the smallest window-aligned '
                             'halo >= that seam-safe floor)')
    parser.add_argument('--bucket', action='store_true',
                        help='pad inputs to tile multiples so mixed-size batches share one '
                             'compiled tile grid (slight border deviation within the halo)')
    parser.add_argument('--bf16', action='store_true', help='run compute in bfloat16')
    parser.add_argument('--int8', action='store_true',
                        help='int8-quantize eligible conv weights (lossy; only helps '
                             '>=128-channel conv bodies — measured neutral-to-SLOWER '
                             'on the standard SR families, see bench_int8.md)')
    parser.add_argument(
        '--no-fused-attention', action='store_true',
        help='disable the fused Pallas window-attention kernel (on by default '
             'on TPU for shapes where it measured faster, e.g. DAT)',
    )
    parser.add_argument(
        '--no-fused-lk', action='store_true',
        help='disable the fused Pallas large-kernel conv (on by default on '
             'TPU for PLKSR-class shapes where it measured 2x XLA)',
    )
    parser.add_argument(
        '--no-chunked-attention', action='store_true',
        help='disable chunking of >=128-window attention batches (on by '
             'default; ~1.9x bf16 / 2.5x f32 on the attention core, exact math)',
    )
    parser.add_argument(
        '--precision', default=None, choices=['highest', 'tensorfloat32', 'bfloat16'],
        help='matmul/conv precision (default: device-fastest; highest = full-f32 MXU passes)',
    )
    parser.add_argument('--trace', metavar='DIR', default=None, help='write a jax profiler trace to DIR')
    parser.add_argument('-v', '--verbose', action='store_true')
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format='%(asctime)s %(name)s %(levelname)s %(message)s',
    )

    import jax

    from resselt_tpu.compile_cache import enable_compilation_cache
    from resselt_tpu.parallel import upscale_tiled

    cache_dir = enable_compilation_cache()
    if cache_dir:
        logger.debug('persistent compile cache: %s', cache_dir)

    t0 = time.perf_counter()
    model = load_model(args.model)
    meta = model.metadata
    logger.info(
        'detected arch=%s name=%s upscale=%s in_ch=%d out_ch=%d config=%s (%.2fs)',
        model.arch_id, meta.name, meta.upscale, meta.in_channels, meta.out_channels,
        type(model.config).__name__, time.perf_counter() - t0,
    )
    if args.scale is not None:
        scales = meta.upscale if isinstance(meta.upscale, (list, tuple)) else [meta.upscale]
        if args.scale not in scales:
            logger.error('model %s supports scale(s) %s, not %d', meta.name, list(scales), args.scale)
            return 1
        if hasattr(model.config, 'eval_scale'):
            model = model.with_config(eval_scale=args.scale)
            logger.info('arbitrary-scale checkpoint: running the %dx tail', args.scale)
    if args.int8:
        model = model.quantize_int8()
        logger.info('int8-quantized eligible conv weights (lossy serving mode)')

    if args.tile == 'auto':
        from resselt_tpu.parallel.tiling import _resolve_tile_hint
        import jax.numpy as jnp

        args.tile = _resolve_tile_hint(model, jnp.bfloat16 if args.bf16 else jnp.float32)
        logger.info('tile auto -> %d (%s)', args.tile,
                    'arch sweet spot' if model.serving_tile else 'default')
    else:
        try:
            args.tile = int(args.tile)
        except ValueError:
            logger.error("--tile must be an integer or 'auto', got %r", args.tile)
            return 1

    if os.path.isdir(args.input):
        names = sorted(n for n in os.listdir(args.input) if n.lower().endswith(IMAGE_EXTS))
        if not names:
            logger.error('no images found in %s', args.input)
            return 1
        pairs = [(os.path.join(args.input, n), os.path.join(args.output, n)) for n in names]
        os.makedirs(args.output, exist_ok=True)
    else:
        pairs = [(args.input, args.output)]
        out_dir = os.path.dirname(args.output)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

    dtype = None
    if args.bf16:
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    if args.no_fused_attention:
        from resselt_tpu.nn.window import use_fused_attention

        use_fused_attention(False)
    if args.no_fused_lk:
        from resselt_tpu.ops.fused_conv import use_fused_lk

        use_fused_lk(False)
    if args.no_chunked_attention:
        from resselt_tpu.nn.window import use_chunked_attention

        use_chunked_attention(False)

    def run_plane(img):
        if args.tile and (img.shape[0] > args.tile or img.shape[1] > args.tile):
            return upscale_tiled(
                model, img, tile=args.tile, halo=args.halo, dtype=dtype,
                precision=args.precision, bucket=args.bucket
            )
        if args.tile and args.bucket:
            # small images bucket too: pad to the tile so mixed-size
            # directories share one compilation instead of one per size
            from resselt_tpu.parallel import upscale_padded

            return upscale_padded(model, img, multiple=args.tile, dtype=dtype,
                                  precision=args.precision)
        return model(img, dtype=dtype, precision=args.precision)

    def run(img):
        import jax.numpy as jnp

        main, alpha = adapt_channels(img, meta.in_channels)
        out = run_plane(main)
        if alpha is not None:
            a3 = np.repeat(alpha, 3, axis=-1) if meta.in_channels == 3 else alpha
            a_out = jnp.mean(run_plane(a3), axis=-1, keepdims=True)
            rgb = out[..., :3] if out.shape[-1] >= 3 else jnp.repeat(out, 3, axis=-1)
            out = jnp.concatenate([rgb, a_out], axis=-1)
        # quantize ON DEVICE: the uint8 transfer is 4x smaller than f32
        # (device->host moves dominate large outputs, esp. through a tunnel)
        q = jnp.clip(out.astype(jnp.float32) * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
        return np.asarray(q)

    def run_all():
        # overlap host-side IO with device compute: the next image decodes
        # while the device runs, and PNG encode/write happens behind the
        # next dispatch (a 16K PNG encode costs seconds)
        from concurrent.futures import ThreadPoolExecutor

        def write_out(dst, out):
            save_image(dst, out)
            logger.info('wrote %s', dst)

        total_mp = 0.0
        t1 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=2) as pool:
            next_img = pool.submit(load_image, pairs[0][0])
            pending_write = None
            try:
                for i, (src, dst) in enumerate(pairs):
                    img = next_img.result()
                    next_img = None
                    if i + 1 < len(pairs):
                        next_img = pool.submit(load_image, pairs[i + 1][0])
                    logger.info('input %s %dx%d', src, img.shape[1], img.shape[0])
                    ts = time.perf_counter()
                    out = np.asarray(run(img))
                    dt = time.perf_counter() - ts
                    mp = out.shape[0] * out.shape[1] / 1e6
                    total_mp += mp
                    logger.info('upscaled to %dx%d in %.2fs (%.2f MP out, incl. compile)',
                                out.shape[1], out.shape[0], dt, mp)
                    if pending_write is not None:
                        pending_write.result()  # surface write failures promptly
                    pending_write = pool.submit(write_out, dst, out)
                if pending_write is not None:
                    pending_write.result()
                    pending_write = None
            finally:
                # on error: drain in-flight futures so their exceptions are
                # attributed here, not dropped as GC-time warnings
                for fut in (next_img, pending_write):
                    if fut is not None:
                        try:
                            fut.result()
                        except Exception as e:  # noqa: BLE001 - secondary failure
                            logger.error('background IO failed: %s', e)
        if len(pairs) > 1:
            dt = time.perf_counter() - t1
            logger.info('%d images, %.2f MP total in %.2fs (%.2f MP/s)',
                        len(pairs), total_mp, dt, total_mp / max(dt, 1e-9))

    if args.trace:
        with jax.profiler.trace(args.trace):
            run_all()
    else:
        run_all()
    return 0


if __name__ == '__main__':
    sys.exit(main())
