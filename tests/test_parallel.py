"""Tests for the tiled driver, mesh sharding, training step, and graft entry."""

import numpy as np
import pytest

import resselt_tpu
from resselt_tpu.parallel import make_mesh, upscale_tiled
from resselt_tpu.zoo import ZOO, make_compact, make_spanplus, make_swinir


def _compact_model():
    return resselt_tpu.load_from_state_dict(make_compact(num_feat=16, num_conv=2, upscale=2))


_ZOO_EXPECTED = {
    'compact': 'Compact', 'spanplus': 'spanplus', 'esrgan': 'ESRGAN',
    'swinir': 'SwinIR', 'span': 'SPAN', 'mosr': 'MoSR',
    'hat': 'HAT', 'atd': 'ATD', 'plksr': 'PLKSR', 'gater': 'GateR',
}

_ZOO_SMALL = {
    'compact': dict(num_feat=16, num_conv=2, upscale=2),
    'spanplus': dict(feature_channels=16, blocks=(2,), upscale=2),
    # gc must stay 32: the reference loader never infers gc and always
    # builds RRDBNet(gc=32), so real checkpoints are always gc=32
    'esrgan': dict(num_filters=16, num_blocks=1, scale=4),
    # depth 2 covers the shifted block's attn_mask buffer emission
    'swinir': dict(embed_dim=16, depths=(2,), num_heads=(2,), window_size=8, upscale=2),
    'span': dict(feature_channels=16, upscale=2),
    'mosr': dict(dim=16, n_block=1, upscale=2),
    'hat': dict(embed_dim=24, depths=(1,), num_heads=(3,), window_size=8, upscale=2),
    'atd': dict(embed_dim=24, depths=(2,), num_heads=(3,), window_size=8,
                num_tokens=8, reducted_dim=4, upscale=2),
    'plksr': dict(dim=16, n_blocks=1, upscale=2, kernel_size=5),
    'gater': dict(dim=16),
}


def test_zoo_checkpoints_detect():
    for name, builder in ZOO.items():
        model = resselt_tpu.load_from_state_dict(builder())
        assert model.arch_id == _ZOO_EXPECTED[name], (name, model.arch_id)


def test_zoo_models_run():
    """Every synthetic checkpoint must load AND produce a correctly-shaped
    output (small configs where the default is big)."""
    img = np.random.default_rng(0).random((16, 16, 3), dtype=np.float32)
    for name, builder in ZOO.items():
        model = resselt_tpu.load_from_state_dict(builder(**_ZOO_SMALL[name]))
        s = model.metadata.upscale
        y = np.asarray(model(img))
        assert y.shape == (16 * s, 16 * s, 3), (name, y.shape)
        assert np.isfinite(y).all(), name


def test_zoo_layouts_accepted_by_reference():
    """The torch reference's own registry must detect every synthetic
    checkpoint and strict-load it — proving the builders reproduce the real
    key/shape layout — and the two forwards must agree."""
    import torch

    from tests.torch_ref import run_torch

    sys_ref = __import__('sys')
    if '/root/reference' not in sys_ref.path:
        sys_ref.path.insert(0, '/root/reference')
    import resselt as resselt_ref

    img = np.random.default_rng(1).random((1, 16, 16, 3), dtype=np.float32)
    for name, builder in ZOO.items():
        sd = builder(**_ZOO_SMALL[name])
        tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
        ref_model = resselt_ref.load_from_state_dict(tsd)  # strict load inside
        ours = resselt_tpu.load_from_state_dict(sd)
        assert ours.arch_id == _ZOO_EXPECTED[name], name
        want = run_torch(ref_model, img)
        got = np.asarray(ours(img))
        err = np.abs(got - want).max()
        assert err < 5e-4, (name, err)


def test_tiled_matches_whole_image():
    model = _compact_model()
    img = np.random.default_rng(0).random((70, 90, 3), dtype=np.float32)
    whole = np.asarray(model(img))
    tiled = np.asarray(upscale_tiled(model, img, tile=32, halo=8))
    assert tiled.shape == whole.shape
    # interior parity; the halo exceeds the receptive field of the 2-conv body
    err = np.abs(tiled - whole).max()
    assert err < 1e-4, f'seam error {err}'


def test_tiled_serving_tile_hint():
    """tile=None resolves to the loader's SRModel.serving_tile hint (or
    256); an explicit tile always wins."""
    model = _compact_model()
    img = np.random.default_rng(9).random((70, 90, 3), dtype=np.float32)

    model.serving_tile = 32
    hinted = np.asarray(upscale_tiled(model, img, halo=8))
    explicit = np.asarray(upscale_tiled(model, img, tile=32, halo=8))
    assert np.abs(hinted - explicit).max() < 1e-6
    assert len(model._tiled_fn_cache) == 1  # both calls shared one compiled grid

    # hint survives with_config clones
    assert model.with_config().serving_tile == 32


def test_tiled_serving_halo_hint():
    """halo=None resolves SRModel.serving_halo (or 16); explicit halo wins.

    Measured per-arch by tools/sweep_halo.py under a seam-parity gate —
    halo recompute is ~56% extra work per tile at t128 h16."""
    model = _compact_model()
    img = np.random.default_rng(9).random((70, 90, 3), dtype=np.float32)

    model.serving_tile = 32
    model.serving_halo = 8
    hinted = np.asarray(upscale_tiled(model, img))
    explicit = np.asarray(upscale_tiled(model, img, tile=32, halo=8))
    assert np.abs(hinted - explicit).max() < 1e-6
    assert len(model._tiled_fn_cache) == 1  # both calls shared one compiled grid
    assert model.with_config().serving_halo == 8


def test_halo_hint_applies_only_at_its_swept_tile():
    """serving_halo applies verbatim AT serving_tile; any other tile gets
    the geometry-derived halo (VERDICT-r4 #4): the swept halo is the
    seam-safe floor (conv halos bound the receptive field, which is
    tile-independent; transformer seam PSNR measured halo-independent),
    window-aligned when the arch sets size_multiple."""
    import jax.numpy as jnp

    from resselt_tpu.parallel.tiling import _resolve_halo_hint

    model = _compact_model()
    model.serving_tile = 256
    model.serving_halo = 4
    assert _resolve_halo_hint(model, 256, jnp.float32) == 4
    # conv arch (no size_multiple): the floor travels to any tile
    assert _resolve_halo_hint(model, 128, jnp.float32) == 4
    model.serving_halo = {'f32': 16, 'bf16': 8}
    assert _resolve_halo_hint(model, 256, jnp.bfloat16) == 8
    assert _resolve_halo_hint(model, 256, jnp.float32) == 16
    # no hints at all -> default 16 at the default tile
    model.serving_halo = None
    model.serving_tile = None
    assert _resolve_halo_hint(model, 256, jnp.float32) == 16


def test_derived_halo_window_alignment():
    """Off-hint tiles get the smallest halo >= the swept floor whose full
    window is a multiple of the arch's size_multiple — no per-tile
    internal re-pad (the hat t192 h4/h12 anomaly, sweep_halo.json)."""
    import jax.numpy as jnp

    from resselt_tpu.parallel.tiling import _resolve_halo_hint, derive_halo

    # pure rule: already aligned / needs rounding / odd multiple (ws=7)
    assert derive_halo(128, 8, 8) == 8        # 144 = 18*8
    assert derive_halo(100, 8, 8) == 10       # 120 = 15*8 (116/118 not)
    assert derive_halo(128, 8, 7) == 13       # 154 = 22*7
    assert derive_halo(128, 16, 16) == 16     # 160 = 10*16
    assert derive_halo(100, 16, 16) == 22     # 144 = 9*16
    assert derive_halo(128, 8, None) == 8     # conv arch: floor only
    # even multiple + odd tile: no aligned window exists -> floor
    assert derive_halo(127, 8, 8) == 8

    # end-to-end through the hint resolver on a transformer-like model
    model = _compact_model()
    model.serving_tile = 128
    model.serving_halo = 8
    model.size_multiple = 8
    assert _resolve_halo_hint(model, 128, jnp.float32) == 8   # swept pair
    assert _resolve_halo_hint(model, 100, jnp.float32) == 10  # derived
    assert _resolve_halo_hint(model, 192, jnp.float32) == 8   # 208 = 26*8
    # hat-like: ws=16, swept h16 at t192; off-hint t100 aligns to 144
    model.serving_tile = 192
    model.serving_halo = 16
    model.size_multiple = 16
    assert _resolve_halo_hint(model, 100, jnp.float32) == 22
    # hint survives the loaders: every tiled transformer carries geometry
    from resselt_tpu.zoo import make_swinir

    sw = resselt_tpu.load_from_state_dict(make_swinir(
        embed_dim=16, depths=(2,), num_heads=(2,), window_size=8, upscale=2))
    assert sw.size_multiple == 8
    assert sw.with_config().size_multiple == 8


def test_derived_halo_seam_parity_off_default_tiles():
    """The derived halo must keep seams at least as clean as the swept
    pair: tile the same image at 2 off-default tiles and compare against
    the whole-image run (tiny swinir, window 8)."""
    from resselt_tpu.metrics import psnr

    model = resselt_tpu.load_from_state_dict(make_swinir(
        embed_dim=16, depths=(2,), num_heads=(2,), window_size=8, upscale=2))
    model.serving_tile = 32
    model.serving_halo = 8
    img = np.random.default_rng(3).random((72, 88, 3), dtype=np.float32)
    whole = np.asarray(model(img))
    base = psnr(np.asarray(upscale_tiled(model, img, tile=32)), whole)
    for tile in (24, 40):  # off-hint: derived halos (24+2*8=40, 40+2*8=56 — both aligned at the floor)
        tiled = np.asarray(upscale_tiled(model, img, tile=tile))
        p = psnr(tiled, whole)
        assert p > 40, (tile, p)
        assert p > base - 3, (tile, p, base)


def test_dtype_aware_serving_tile():
    """serving_tile may be a {'f32': n, 'bf16': m} dict like tile_batch;
    the halo hint's swept-tile gate follows the tile resolved for the SAME
    serving dtype."""
    import jax.numpy as jnp

    from resselt_tpu.parallel.tiling import _resolve_halo_hint, _resolve_tile_hint

    model = _compact_model()
    model.serving_tile = {'f32': 48, 'bf16': 32}
    assert _resolve_tile_hint(model, jnp.float32) == 48
    assert _resolve_tile_hint(model, jnp.bfloat16) == 32
    assert _resolve_tile_hint(model, np.float32) == 48  # np dtypes normalize too

    model.serving_halo = {'f32': 12, 'bf16': 8}
    assert _resolve_halo_hint(model, 32, jnp.bfloat16) == 8
    assert _resolve_halo_hint(model, 48, jnp.float32) == 12
    # tile swept for the OTHER dtype -> that dtype's floor (geometry rule;
    # no size_multiple on a conv arch, so the floor applies unrounded)
    assert _resolve_halo_hint(model, 48, jnp.bfloat16) == 8
    assert _resolve_halo_hint(model, 32, jnp.float32) == 12

    # driver-level: tile=None resolves per dtype, equivalent to explicit
    img = np.random.default_rng(9).random((70, 90, 3), dtype=np.float32)
    hinted = np.asarray(upscale_tiled(model, img, dtype=jnp.bfloat16))
    explicit = np.asarray(upscale_tiled(model, img, tile=32, halo=8, dtype=jnp.bfloat16))
    assert np.abs(hinted - explicit).max() < 1e-6


def test_tiled_dtype_aware_serving_halo():
    """serving_halo may be a {'f32': n, 'bf16': m} dict like tile_batch
    (ATD: the odd-window-grid pathology hits f32 only, sweep_halo.json);
    the driver resolves it against the serving dtype."""
    import jax.numpy as jnp

    model = _compact_model()
    img = np.random.default_rng(9).random((70, 90, 3), dtype=np.float32)

    model.serving_tile = 32
    model.serving_halo = {'f32': 8, 'bf16': 4}
    f32_hinted = np.asarray(upscale_tiled(model, img))
    f32_explicit = np.asarray(upscale_tiled(model, img, tile=32, halo=8))
    assert np.abs(f32_hinted - f32_explicit).max() < 1e-6

    b16_hinted = np.asarray(upscale_tiled(model, img, dtype=jnp.bfloat16),
                            dtype=np.float32)
    b16_explicit = np.asarray(
        upscale_tiled(model, img, tile=32, halo=4, dtype=jnp.bfloat16),
        dtype=np.float32)
    assert np.abs(b16_hinted - b16_explicit).max() < 1e-6
    # the two dtypes compiled DIFFERENT grids (halo 8 vs 4)
    grids = {key[0] for key in model._tiled_fn_cache}
    assert len(grids) == 2
    # dict hint survives clones and normalizes string dtypes
    assert model.with_config().serving_halo == {'f32': 8, 'bf16': 4}


def test_tiled_dtype_aware_tile_batch():
    """SRModel.tile_batch may be a {'f32': n, 'bf16': m} dict; the driver
    resolves it against the serving dtype and output is batch-invariant."""
    import jax.numpy as jnp

    model = _compact_model()
    model.tile_batch = {'f32': 1, 'bf16': 4}
    img = np.random.default_rng(7).random((70, 90, 3), dtype=np.float32)

    ref = np.asarray(upscale_tiled(model, img, tile=32, halo=8, batch_size=2))
    got_f32 = np.asarray(upscale_tiled(model, img, tile=32, halo=8))
    assert np.abs(got_f32 - ref).max() < 1e-5
    got_bf16 = np.asarray(upscale_tiled(model, img, tile=32, halo=8, dtype=jnp.bfloat16))
    assert got_bf16.shape == ref.shape
    # the jitted-fn cache key carries the resolved batch per dtype
    batches = {str(k[2]): k[1] for k in model._tiled_fn_cache}
    assert batches['float32'] == 1 and batches['bfloat16'] == 4


def test_tiled_narrow_strip():
    # one dim smaller than 2*halo: window must shrink below the short dim
    # instead of crashing in dynamic_slice (ADVICE r1)
    model = _compact_model()
    img = np.random.default_rng(2).random((20, 300, 3), dtype=np.float32)
    whole = np.asarray(model(img))
    tiled = np.asarray(upscale_tiled(model, img, tile=64, halo=16))
    assert tiled.shape == whole.shape
    assert np.abs(tiled - whole).max() < 1e-4

    # the long axis must KEEP the configured tile (rectangular windows),
    # not degenerate into many tiny squares sized by the short dim
    from resselt_tpu.parallel import plan_grid

    keys = list(model._tiled_fn_cache)
    grid = keys[-1][0]
    assert len(grid.ys) == 1 and grid.window[0] == 20  # single y strip
    assert grid.window[1] == 96 and len(grid.xs) == 5  # x keeps tile 64
    assert grid == plan_grid(20, 300, (2, 64), (9, 16))


def test_tiled_on_device_matches_host_loop():
    # the fused single-dispatch path (extract -> scan over batches -> stitch)
    # must match the per-batch host loop exactly
    model = _compact_model()
    img = np.random.default_rng(3).random((70, 90, 3), dtype=np.float32)
    host = np.asarray(upscale_tiled(model, img, tile=32, halo=8, on_device=False))
    fused = np.asarray(upscale_tiled(model, img, tile=32, halo=8, on_device=True))
    np.testing.assert_allclose(fused, host, atol=1e-6)
    unrolled = np.asarray(
        upscale_tiled(model, img, tile=32, halo=8, on_device=True, unroll=2))
    np.testing.assert_allclose(unrolled, host, atol=1e-6)


def test_tiled_program_matches_upscale_tiled():
    # tiled_program exposes the exact program upscale_tiled serves (shared
    # planning + jit cache); benchmark.measure_tiled wraps it in a loop
    from resselt_tpu.parallel.tiling import tiled_program

    model = _compact_model()
    img = np.random.default_rng(4).random((70, 90, 3), dtype=np.float32)
    fn, scale = tiled_program(model, 70, 90, tile=32, halo=8)
    assert scale == model.metadata.upscale
    direct = np.asarray(upscale_tiled(model, img, tile=32, halo=8))
    np.testing.assert_allclose(np.asarray(fn(model.params, img)), direct, atol=0)
    # both resolved to the same cache entry — no second compilation
    assert len(model.__dict__['_tiled_fn_cache']) == 1
    # an image that fits one window signals None (caller runs the model whole)
    fn_small, _ = tiled_program(model, 40, 40, tile=32, halo=8)
    assert fn_small is None


def test_measure_tiled_runs():
    from resselt_tpu.benchmark import measure_tiled

    model = _compact_model()
    mps, sec = measure_tiled(model, (96, 140), tile=32, halo=8, min_seconds=0.05)
    assert mps > 0 and sec > 0


def test_tiled_bucket_shares_grid_and_matches_interior():
    # bucket=True pads to tile multiples: two different sizes in one bucket
    # reuse a single compiled grid, and interior pixels match the exact run
    model = _compact_model()
    img = np.random.default_rng(5).random((70, 90, 3), dtype=np.float32)
    exact = np.asarray(upscale_tiled(model, img, tile=32, halo=8))
    bucketed = np.asarray(upscale_tiled(model, img, tile=32, halo=8, bucket=True))
    assert bucketed.shape == exact.shape
    # away from the pad seam (bottom/right) the outputs agree
    err = np.abs(bucketed[:100, :100] - exact[:100, :100]).max()
    assert err < 1e-4, err
    # a second size in the same bucket hits the cached grid (same key)
    img2 = np.random.default_rng(6).random((65, 82, 3), dtype=np.float32)
    cache = model.__dict__['_tiled_fn_cache']
    n_before = len(cache)
    out2 = np.asarray(upscale_tiled(model, img2, tile=32, halo=8, bucket=True))
    assert out2.shape == (130, 164, 3)
    assert len(cache) == n_before  # no new compilation


def test_tiled_on_device_with_mesh():
    import jax

    model = _compact_model()
    mesh = make_mesh(n_devices=min(4, len(jax.devices())), dp=None, tp=1, axis_names=('dp', 'tp'))
    img = np.random.default_rng(4).random((64, 96, 3), dtype=np.float32)
    whole = np.asarray(model(img))
    tiled = np.asarray(upscale_tiled(model, img, tile=16, halo=8, mesh=mesh, on_device=True))
    assert np.abs(tiled - whole).max() < 1e-4


def test_tiled_with_mesh():
    import jax

    model = _compact_model()
    mesh = make_mesh(n_devices=min(4, len(jax.devices())), dp=None, tp=1, axis_names=('dp', 'tp'))
    img = np.random.default_rng(1).random((64, 64, 3), dtype=np.float32)
    whole = np.asarray(model(img))
    tiled = np.asarray(upscale_tiled(model, img, tile=16, halo=8, mesh=mesh))
    assert np.abs(tiled - whole).max() < 1e-4


def test_tiled_tp_sharded_matches():
    """tp-sharded serving: model params sharded over a (dp=2, tp=2) mesh's
    tp axis, tiles over dp, through the on-device tiled driver — output
    must match the single-device whole-image forward."""
    import copy

    import jax

    from resselt_tpu.parallel.mesh import shard_params
    from resselt_tpu.zoo import make_esrgan

    if len(jax.devices()) < 4:
        pytest.skip('needs 4 devices')
    import resselt_tpu

    model = resselt_tpu.load_from_state_dict(
        make_esrgan(num_filters=16, num_blocks=2, scale=2)
    )
    img = np.random.default_rng(7).random((48, 64, 3), dtype=np.float32)
    whole = np.asarray(model(img))

    mesh = make_mesh(n_devices=4, tp=2, axis_names=('dp', 'tp'))
    sharded = copy.copy(model)
    sharded.__dict__.pop('_tiled_fn_cache', None)
    sharded.params = shard_params(mesh, model.params, min_size=1)
    tiled = np.asarray(upscale_tiled(sharded, img, tile=16, halo=8, mesh=mesh, on_device=True))
    assert tiled.shape == whole.shape
    assert np.abs(tiled - whole).max() < 1e-4


def test_train_step_decreases_loss():
    import jax.numpy as jnp

    from resselt_tpu.train import init_train_state, make_optimizer, make_train_step

    model = _compact_model()
    opt = make_optimizer(lr=1e-3)
    state = init_train_state(model.params, opt)
    step = make_train_step(model._apply_fn, model.config, opt)

    rng = np.random.default_rng(2)
    hr = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    lr = hr[:, ::2, ::2, :]

    import jax

    step = jax.jit(step)
    state, m0 = step(state, lr, hr)
    for _ in range(10):
        state, m = step(state, lr, hr)
    assert float(m['loss']) < float(m0['loss'])
    assert int(state.step) == 11


def test_swinir_train_grads_flow():
    import jax

    from resselt_tpu.train import init_train_state, make_optimizer, make_train_step

    model = resselt_tpu.load_from_state_dict(
        make_swinir(embed_dim=16, depths=(1,), num_heads=(2,), window_size=8, upscale=2)
    )
    opt = make_optimizer()
    state = init_train_state(model.params, opt)
    step = jax.jit(make_train_step(model._apply_fn, model.config, opt))
    lr = np.random.default_rng(0).random((1, 16, 16, 3), dtype=np.float32)
    hr = np.random.default_rng(1).random((1, 32, 32, 3), dtype=np.float32)
    state, m = step(state, lr, hr)
    assert np.isfinite(float(m['loss']))
    assert float(m['grad_norm']) > 0


def test_graft_entry_and_dryrun():
    import sys

    sys.path.insert(0, '/root/repo')
    import __graft_entry__ as g

    import jax

    fn, (params, x) = g.entry()
    y = jax.jit(fn)(params, x)
    assert y.shape == (1, 256, 256, 3)
    g.dryrun_multichip(min(8, len(jax.devices())))


def test_upscale_padded_bucketing():
    """Different sizes in one bucket share a jit entry; interior matches."""
    from resselt_tpu.parallel import upscale_padded

    model = _compact_model()
    rng = np.random.default_rng(9)
    img = rng.random((37, 45, 3), dtype=np.float32)
    out = np.asarray(upscale_padded(model, img, multiple=32))
    assert out.shape == (74, 90, 3)

    whole = np.asarray(model(img))
    # interior (away from the pad seam) must match the unpadded run
    np.testing.assert_allclose(out[:60, :70], whole[:60, :70], atol=1e-5)

    # a second size in the same bucket must NOT add a jit specialization
    n_before = model._jitted._cache_size()
    out2 = upscale_padded(model, rng.random((50, 40, 3), dtype=np.float32), multiple=32)
    assert np.asarray(out2).shape == (100, 80, 3)
    assert model._jitted._cache_size() == n_before

    # tiny image: pad larger than the image falls back to edge mode
    tiny = rng.random((5, 6, 3), dtype=np.float32)
    out3 = np.asarray(upscale_padded(model, tiny, multiple=32))
    assert out3.shape == (10, 12, 3)


def test_model_cost_analysis():
    model = _compact_model()
    c = model.cost(32, 32)
    assert c['params'] > 0
    # conv FLOPs at 32x32 must dominate the param count
    assert c['flops'] > 1e6


def test_precision_argument():
    """precision='highest' must be accepted whole-image and tiled (on CPU
    both paths are exact; on TPU 'highest' forces full-f32 MXU passes —
    measured 120 dB vs 92 dB parity on the live chip)."""
    model = _compact_model()
    img = np.random.default_rng(7).random((40, 40, 3), dtype=np.float32)
    base = np.asarray(model(img))
    hi = np.asarray(model(img, precision='highest'))
    np.testing.assert_allclose(hi, base, rtol=1e-5, atol=1e-6)
    tiled = np.asarray(upscale_tiled(model, img, tile=16, halo=8, precision='highest'))
    np.testing.assert_allclose(tiled, base, rtol=1e-4, atol=1e-5)


def test_bf16_inference_close_to_f32():
    import jax.numpy as jnp

    model = _compact_model()
    img = np.random.default_rng(5).random((32, 32, 3), dtype=np.float32)
    f32 = np.asarray(model(img))
    bf16 = np.asarray(model(img, dtype=jnp.bfloat16)).astype(np.float32)
    mse = np.mean((f32 - bf16) ** 2)
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 35, f'bf16 path too lossy: {psnr:.1f} dB'


def test_tiled_transformer_seam_quality():
    """Window-attention models see beyond any fixed halo, so tiled output is
    an approximation; assert the seams stay below visible error."""
    model = resselt_tpu.load_from_state_dict(
        make_swinir(embed_dim=16, depths=(2,), num_heads=(2,), window_size=8, upscale=2)
    )
    img = np.random.default_rng(11).random((48, 48, 3), dtype=np.float32)
    whole = np.asarray(model(img))
    tiled = np.asarray(upscale_tiled(model, img, tile=16, halo=8))
    mse = np.mean((whole - tiled) ** 2)
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 40, f'tiled transformer seams too visible: {psnr:.1f} dB'
