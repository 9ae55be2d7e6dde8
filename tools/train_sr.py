"""SR fine-tuning / training loop over a folder of images.

The reference ships no training code (SURVEY.md §0); this drives
``resselt_tpu.train`` end-to-end: random HR crops paired with synthetic LR
(box-downsampled) inputs, data-parallel sharding over all devices, periodic
eval PSNR, and checkpointing via the converted-model cache.

    python tools/train_sr.py CKPT_OR_NPZ IMAGE_DIR --steps 1000 --scale 2
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger('resselt_tpu.train')


def load_images(image_dir: str, min_size: int) -> list[np.ndarray]:
    from PIL import Image

    files = sorted(
        f for ext in ('png', 'jpg', 'jpeg', 'webp', 'bmp')
        for f in glob.glob(os.path.join(image_dir, f'*.{ext}'))
    )
    out = []
    for f in files:
        img = np.asarray(Image.open(f).convert('RGB'), dtype=np.float32) / 255.0
        if img.shape[0] >= min_size and img.shape[1] >= min_size:
            out.append(img)
    if not out:
        raise SystemExit(f'no usable images >= {min_size}px in {image_dir}')
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('model', help='checkpoint (.pth/.safetensors/...) or cached .npz')
    parser.add_argument('images', help='directory of training images')
    parser.add_argument('--steps', type=int, default=200)
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--crop', type=int, default=64, help='HR crop size')
    parser.add_argument('--lr', type=float, default=2e-4)
    parser.add_argument('--schedule', default='constant', choices=['constant', 'cosine', 'multistep'])
    parser.add_argument('--warmup', type=int, default=0, help='linear warmup steps')
    parser.add_argument('--loss', default='charbonnier', choices=['charbonnier', 'l1', 'l2'])
    parser.add_argument('--ema', type=float, default=0.0, help='EMA decay (0 disables; e.g. 0.999)')
    parser.add_argument('--remat', action='store_true',
                        help='rematerialize activations in the backward pass (fit bigger crops/batches)')
    parser.add_argument('--save', default=None, help='write fine-tuned model cache (.npz)')
    parser.add_argument('--checkpoint', default=None, help='orbax train-state dir for save/resume')
    parser.add_argument('--checkpoint-every', type=int, default=0, help='save train state every N steps')
    parser.add_argument('--log-every', type=int, default=20)
    parser.add_argument('--loader', default='auto', choices=['auto', 'native', 'numpy'],
                        help='batch sampler backend (native = threaded C++ via ctypes)')
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format='%(asctime)s %(levelname)s %(message)s')

    import jax
    import jax.numpy as jnp

    from resselt_tpu.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from jax.sharding import NamedSharding, PartitionSpec as P

    import resselt_tpu
    from resselt_tpu.cache import load_model, save_model
    from resselt_tpu.parallel.mesh import make_mesh, param_sharding
    from resselt_tpu.train import (
        ema_params, init_train_state, load_train_state, make_lr_schedule,
        make_optimizer, make_train_step, psnr, save_train_state,
    )

    if args.model.endswith('.npz'):
        model = load_model(args.model)
    else:
        model = resselt_tpu.load_from_file(args.model)
    scale = model.metadata.upscale
    if not isinstance(scale, int):
        scale = 2
    logger.info('model %s (%s), scale %s', model.arch_id, model.metadata.name, scale)

    from resselt_tpu.data import CropSampler, Prefetcher

    images = load_images(args.images, args.crop)
    images_u8 = [(im * 255.0 + 0.5).astype(np.uint8) for im in images]
    sampler = CropSampler(images_u8, crop=args.crop, scale=scale, seed=0, backend=args.loader)
    logger.info('%d training images (%s sampler)', len(images), sampler.backend)

    n_dev = len(jax.devices())
    batch = max(args.batch - args.batch % n_dev, n_dev)
    mesh = make_mesh(dp=n_dev, tp=1)
    data_sharding = NamedSharding(mesh, P('dp'))
    logger.info('devices=%d batch=%d', n_dev, batch)

    schedule = make_lr_schedule(args.lr, args.schedule, total_steps=args.steps, warmup_steps=args.warmup)
    optimizer = make_optimizer(lr=schedule)
    state = init_train_state(model.params, optimizer, ema=args.ema > 0)
    start_step = 0
    if args.checkpoint and os.path.isdir(args.checkpoint):
        state = load_train_state(args.checkpoint, state)
        start_step = int(state.step)
        logger.info('resumed train state from %s at step %d', args.checkpoint, start_step)
    p_shard = param_sharding(mesh, state.params)
    state = state._replace(params={k: jax.device_put(v, p_shard[k]) for k, v in state.params.items()})
    step_fn = jax.jit(
        make_train_step(model._apply_fn, model.config, optimizer, loss=args.loss,
                        ema_decay=args.ema, remat=args.remat),
        donate_argnums=(0,),
    )

    eval_lr, eval_hr = sampler.next_batch(batch)
    eval_lr = jax.device_put(jnp.asarray(eval_lr), data_sharding)
    eval_hr = jax.device_put(jnp.asarray(eval_hr), data_sharding)

    apply_jit = jax.jit(lambda p, x: model._apply_fn(model.config, p, x))
    base_psnr = float(psnr(apply_jit(state.params, eval_lr), eval_hr))
    logger.info('initial eval PSNR %.2f dB', base_psnr)

    t0 = time.perf_counter()
    prefetch = Prefetcher(sampler, batch)
    try:
        with mesh:
            for step in range(start_step + 1, args.steps + 1):
                lr_np, hr_np = prefetch.next()
                lr_b = jax.device_put(jnp.asarray(lr_np), data_sharding)
                hr_b = jax.device_put(jnp.asarray(hr_np), data_sharding)
                state, metrics = step_fn(state, lr_b, hr_b)
                if step % args.log_every == 0 or step == args.steps:
                    loss = float(metrics['loss'])
                    gn = float(metrics['grad_norm'])
                    ips = (step - start_step) * batch / (time.perf_counter() - t0)
                    logger.info('step %d loss %.5f grad_norm %.3f (%.1f img/s)', step, loss, gn, ips)
                if args.checkpoint and args.checkpoint_every and step % args.checkpoint_every == 0:
                    save_train_state(state, args.checkpoint)
                    logger.info('checkpointed train state at step %d -> %s', step, args.checkpoint)
    finally:
        prefetch.close()

    if args.checkpoint:
        save_train_state(state, args.checkpoint)
        logger.info('checkpointed final train state -> %s', args.checkpoint)

    out_params = ema_params(state) if args.ema > 0 else state.params
    final_out = apply_jit(out_params, eval_lr)
    final_psnr = float(psnr(final_out, eval_hr))
    from resselt_tpu.metrics import ssim

    final_ssim = ssim(np.clip(np.asarray(final_out, np.float32), 0, 1),
                      np.asarray(eval_hr, np.float32))
    logger.info('final eval PSNR %.2f dB / SSIM %.4f (was %.2f dB)%s',
                final_psnr, final_ssim, base_psnr,
                ' [EMA weights]' if args.ema > 0 else '')

    if args.save:
        model.params = out_params
        if args.save.endswith('.safetensors'):
            from resselt_tpu.io import write_safetensors

            write_safetensors(out_params, args.save, metadata={'arch': model.arch_id})
        else:
            save_model(model, args.save)
        logger.info('saved fine-tuned model to %s', args.save)
    return 0


if __name__ == '__main__':
    sys.exit(main())
