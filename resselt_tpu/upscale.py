"""Command-line upscaler.

    python -m resselt_tpu.upscale MODEL INPUT OUTPUT [--tile 256] [--halo 16]

The reference ships no CLI (SURVEY.md §0); this is the end-to-end driver:
checkpoint -> detection -> jit-compiled inference (tiled for large inputs)
-> image out, with structured logging of the detection result and optional
jax profiler traces.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np

logger = logging.getLogger('resselt_tpu')


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert('RGB')
    return np.asarray(img, dtype=np.float32) / 255.0


def save_image(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(np.asarray(arr), 0.0, 1.0)
    Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8)).save(path)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description='Upscale an image with an auto-detected SR model.')
    parser.add_argument('model', help='checkpoint file (.pth/.pt/.ckpt/.safetensors)')
    parser.add_argument('input', help='input image')
    parser.add_argument('output', help='output image')
    parser.add_argument('--tile', type=int, default=0, help='tile size for tiled inference (0 = whole image)')
    parser.add_argument('--halo', type=int, default=16, help='tile halo/overlap')
    parser.add_argument('--bf16', action='store_true', help='run compute in bfloat16')
    parser.add_argument('--trace', metavar='DIR', default=None, help='write a jax profiler trace to DIR')
    parser.add_argument('-v', '--verbose', action='store_true')
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format='%(asctime)s %(name)s %(levelname)s %(message)s',
    )

    import jax

    import resselt_tpu
    from resselt_tpu.parallel import upscale_tiled

    t0 = time.perf_counter()
    model = resselt_tpu.load_from_file(args.model)
    meta = model.metadata
    logger.info(
        'detected arch=%s name=%s upscale=%s in_ch=%d out_ch=%d config=%s (%.2fs)',
        model.arch_id, meta.name, meta.upscale, meta.in_channels, meta.out_channels,
        type(model.config).__name__, time.perf_counter() - t0,
    )

    img = load_image(args.input)
    logger.info('input %s %dx%d', args.input, img.shape[1], img.shape[0])

    dtype = None
    if args.bf16:
        import jax.numpy as jnp

        dtype = jnp.bfloat16

    def run():
        if args.tile and (img.shape[0] > args.tile or img.shape[1] > args.tile):
            return upscale_tiled(model, img, tile=args.tile, halo=args.halo)
        return model(img, dtype=dtype)

    t1 = time.perf_counter()
    if args.trace:
        with jax.profiler.trace(args.trace):
            out = np.asarray(run())
    else:
        out = np.asarray(run())
    dt = time.perf_counter() - t1
    mp = out.shape[0] * out.shape[1] / 1e6
    logger.info('upscaled to %dx%d in %.2fs (%.2f MP out, incl. compile)', out.shape[1], out.shape[0], dt, mp)

    save_image(args.output, out.astype(np.float32))
    logger.info('wrote %s', args.output)
    return 0


if __name__ == '__main__':
    sys.exit(main())
