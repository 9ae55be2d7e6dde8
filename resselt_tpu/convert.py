"""Checkpoint pre-conversion CLI.

    python -m resselt_tpu.convert MODEL OUT.npz

Detects the architecture, runs all load-time weight transforms (key
remapping, reparameterization collapse, config inference) once, and writes
the ready-to-run JAX model to a ``.npz`` cache (see ``resselt_tpu.cache``).
Loading the cache skips torch-pickle parsing and all load-time transforms —
useful for serving fleets where startup latency matters.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

logger = logging.getLogger('resselt_tpu')


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description='Convert a checkpoint to a resselt_tpu .npz cache.')
    parser.add_argument('model', help='checkpoint file (.pth/.pt/.ckpt/.safetensors)')
    parser.add_argument('output', help='output cache path (.npz)')
    parser.add_argument('-v', '--verbose', action='store_true')
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format='%(asctime)s %(name)s %(levelname)s %(message)s',
    )
    if not args.output.endswith('.npz'):
        parser.error('output must end in .npz')

    import resselt_tpu
    from resselt_tpu.cache import save_model
    from resselt_tpu.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    t0 = time.perf_counter()
    model = resselt_tpu.load_from_file(args.model)
    meta = model.metadata
    logger.info(
        'detected arch=%s name=%s upscale=%s in_ch=%d out_ch=%d (%.2fs)',
        model.arch_id, meta.name, meta.upscale, meta.in_channels, meta.out_channels,
        time.perf_counter() - t0,
    )
    save_model(model, args.output)
    logger.info('wrote %s', args.output)
    return 0


if __name__ == '__main__':
    sys.exit(main())
