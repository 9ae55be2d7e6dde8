"""Overlap-tiled inference driver.

The reference has no tiling driver — callers (chaiNNer etc.) tile
externally (SURVEY.md §5 long-context row).  Here tiling is a first-class
TPU capability: fixed-size tile windows are batched into one static shape
(one XLA compilation), optionally sharded across a device mesh, and
stitched from halo-cropped cores.

Shifted inner tiling: every window lies fully inside the image, and edge
windows are flush with the image borders, so border pixels see the model's
own border handling exactly as a whole-image run would.  Output is
therefore identical to the un-tiled run wherever the model's receptive
field fits inside the halo.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


logger = logging.getLogger('resselt_tpu.tiling')

# max jitted tiled-forward callables kept per model (see LRU in upscale_tiled)
_TILED_FN_CACHE_MAX = 8


@dataclass(frozen=True)
class TileGrid:
    height: int
    width: int
    window: tuple[int, int]  # full tile window per axis (core + 2*halo)
    halo: tuple[int, int]
    ys: tuple[int, ...]  # window origins (top)
    xs: tuple[int, ...]  # window origins (left)


def _origins(size: int, window: int, stride: int) -> tuple[int, ...]:
    if size <= window:
        return (0,)
    xs = list(range(0, size - window, stride))
    xs.append(size - window)
    return tuple(xs)


def plan_grid(height: int, width: int, tile, halo) -> TileGrid:
    """``tile``/``halo``: int (square windows) or per-axis ``(y, x)`` pairs
    (rectangular windows, e.g. for strip images whose short dimension is
    smaller than the configured window)."""
    ty, tx = (tile, tile) if isinstance(tile, int) else tile
    oy, ox = (halo, halo) if isinstance(halo, int) else halo
    return TileGrid(
        height=height,
        width=width,
        window=(ty + 2 * oy, tx + 2 * ox),
        halo=(oy, ox),
        ys=_origins(height, ty + 2 * oy, ty),
        xs=_origins(width, tx + 2 * ox, tx),
    )


def extract_tiles(image, grid: TileGrid):
    """(H, W, C) -> (len(ys)*len(xs), window_y, window_x, C)."""
    wy, wx = grid.window
    c = image.shape[-1]
    tiles = [
        jax.lax.dynamic_slice(image, (y, x, 0), (wy, wx, c))
        for y in grid.ys
        for x in grid.xs
    ]
    return jnp.stack(tiles)


def stitch_tiles(out_tiles, grid: TileGrid, scale: int):
    """Assemble output image from upscaled tile windows.

    Each window contributes its halo-cropped core, except at image borders
    where the window is flush with the border and contributes up to it."""
    (wy, wx), (oy, ox) = grid.window, grid.halo
    h, w = grid.height * scale, grid.width * scale
    c = out_tiles.shape[-1]
    canvas = jnp.zeros((h, w, c), out_tiles.dtype)
    i = 0
    for y in grid.ys:
        for x in grid.xs:
            t = out_tiles[i]
            i += 1
            y0 = 0 if y == 0 else (y + oy) * scale
            y1 = h if y + wy >= grid.height else (y + wy - oy) * scale
            x0 = 0 if x == 0 else (x + ox) * scale
            x1 = w if x + wx >= grid.width else (x + wx - ox) * scale
            ty0 = y0 - y * scale
            tx0 = x0 - x * scale
            piece = jax.lax.dynamic_slice(t, (ty0, tx0, 0), (y1 - y0, x1 - x0, c))
            canvas = jax.lax.dynamic_update_slice(canvas, piece, (y0, x0, 0))
    return canvas


_extract_tiles_jit = jax.jit(extract_tiles, static_argnums=1)
_stitch_tiles_jit = jax.jit(stitch_tiles, static_argnums=(1, 2))


def _make_fused_tiled_fn(model, grid: TileGrid, scale: int, batch_size: int,
                         precision: str | None, mesh, unroll: int):
    """One jitted program: extract tiles -> scan model over tile batches ->
    stitch.  The whole grid runs in a single host->device dispatch; through a
    remote-TPU tunnel each dispatch costs ~110 ms, so a 45-tile transformer
    grid at batch 2 drops from ~23 dispatches to 1."""
    apply_fn = model._apply_fn
    config = model.config
    wy, wx = grid.window
    n = len(grid.ys) * len(grid.xs)
    pad_n = -n % batch_size
    nb = (n + pad_n) // batch_size
    if mesh is not None:
        sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(mesh.axis_names[0]))

    def fn(params, image):
        tiles = extract_tiles(image, grid)
        if pad_n:
            tiles = jnp.concatenate([tiles, jnp.tile(tiles[-1:], (pad_n, 1, 1, 1))])
        batches = tiles.reshape(nb, batch_size, wy, wx, tiles.shape[-1])

        def body(_, chunk):
            if mesh is not None:
                chunk = jax.lax.with_sharding_constraint(chunk, sharding)
            if precision is None:
                y = apply_fn(config, params, chunk)
            else:
                with jax.default_matmul_precision(precision):
                    y = apply_fn(config, params, chunk)
            return None, y

        if nb == 1:
            outs = body(None, batches[0])[1][None]
        else:
            _, outs = jax.lax.scan(body, None, batches, unroll=unroll)
        out_tiles = outs.reshape(nb * batch_size, wy * scale, wx * scale, -1)[:n]
        return stitch_tiles(out_tiles, grid, scale)

    return jax.jit(fn)


def _pad_to_multiple_hw(image, multiple: int):
    """Pad the trailing-spatial dims up to multiples (reflect; edge when the
    image is smaller than the pad). Returns (padded, orig_h, orig_w)."""
    h, w = image.shape[-3], image.shape[-2]
    ph = -h % multiple
    pw = -w % multiple
    if ph or pw:
        mode = 'reflect' if (ph < h and pw < w) else 'edge'
        pads = [(0, 0)] * (image.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        image = jnp.pad(image, pads, mode=mode)
    return image, h, w


def upscale_padded(
    model,
    image,
    multiple: int = 64,
    dtype=None,
    precision: str | None = None,
):
    """Serve variable-size images with one compilation per size *bucket*.

    Pads (H, W) up to the next multiples of ``multiple`` (reflect; edge for
    tiny images) and crops the output back, so all inputs in a bucket share
    one jit specialization instead of recompiling per exact size — the XLA
    analogue of serving-system shape bucketing.  Interior output is
    identical to the unpadded run; pixels within the model's receptive
    field of the pad seam can differ slightly from the model's own border
    handling."""
    image = jnp.asarray(image)
    squeeze = image.ndim == 3
    if squeeze:
        image = image[None]
    scale = model.metadata.upscale
    if not isinstance(scale, int):
        raise ValueError('upscale_padded requires an integer upscale factor')
    image, h, w = _pad_to_multiple_hw(image, multiple)
    out = model(image, dtype=dtype, precision=precision)
    out = out[:, : h * scale, : w * scale, :]
    return out[0] if squeeze else out


def _resolve_dtype_hint(val, eff_dtype):
    """Resolve an ``int | {'f32': n, 'bf16': m}`` serving hint against the
    dtype the tiles will actually run in (normalized so strings like
    'bfloat16' and np/jnp dtype objects compare equal)."""
    if isinstance(val, dict):
        eff = np.dtype(eff_dtype)
        group = 'bf16' if eff in (np.dtype(jnp.bfloat16), np.dtype(jnp.float16)) else 'f32'
        return val.get(group) or val.get('f32')
    return val


def _resolve_tile_hint(model, eff_dtype) -> int:
    """Resolve ``SRModel.serving_tile`` (an int, or a per-dtype dict like
    ``tile_batch``) against the serving dtype; conv-model default 256."""
    return _resolve_dtype_hint(getattr(model, 'serving_tile', None), eff_dtype) or 256


def derive_halo(tile: int, floor: int, multiple: int | None) -> int:
    """Smallest halo ``h >= floor`` whose full window ``tile + 2*h`` is a
    multiple of the arch's spatial ``multiple`` (attention window size /
    max split size / unshuffle factor).  A non-multiple window forces an
    internal re-pad on EVERY tile — at t192 h4 that pad is 27-56% wasted
    recompute plus the hat odd-grid pathology (sweep_halo.json).  When no
    aligned halo exists within one period (even ``multiple`` with the
    wrong window parity), the floor is returned unchanged — the model
    re-pads internally exactly as it would for any free-size input."""
    if not multiple or multiple <= 1:
        return floor
    for h in range(floor, floor + multiple):
        if (tile + 2 * h) % multiple == 0:
            return h
    return floor


def _resolve_halo_hint(model, tile: int, eff_dtype) -> int:
    """Resolve the serving halo for ``tile``.

    At the tile the halo sweep visited (``serving_tile``), the measured
    ``serving_halo`` hint applies verbatim.  Any other tile gets a
    GEOMETRY-DERIVED halo (VERDICT-r4 #4): the swept halo is the arch's
    seam-safe floor — round-4's sweep showed seam PSNR is halo-independent
    across h8-h24 for every tiled family (the tiled-vs-whole residual is
    content divergence of windowed attention, not seam width), and conv
    halos bound the receptive field, which does not depend on the tile —
    rounded up so the full window hits the arch's ``size_multiple``
    (window-size alignment, no per-tile internal re-pad).  Archs without
    a hint keep the conservative driver default 16 (aligned likewise)."""
    hint_tile = _resolve_tile_hint(model, eff_dtype)
    halo = _resolve_dtype_hint(getattr(model, 'serving_halo', None), eff_dtype)
    if tile == hint_tile and halo:
        return halo
    return derive_halo(tile, halo or 16, getattr(model, 'size_multiple', None))


def _plan_tiled(model, h: int, w: int, tile: int, halo: int,
                batch_size: int | None, eff_dtype, mesh):
    """Resolve the tile grid + batch for an (h, w) image, or None when the
    image fits in one window (callers run the model whole).

    ``eff_dtype`` is the dtype the tiles will actually run in (it selects
    the dtype-dependent ``SRModel.tile_batch`` group)."""
    window = tile + 2 * halo
    if h <= window and w <= window:
        return None
    # A dimension smaller than a window becomes a single strip: shrink the
    # window (and, for tiny dims, the halo — dynamic_slice requires
    # window <= dim) along THAT axis only; the long axis keeps the
    # configured tile so strips don't degenerate into many tiny squares.
    ty = tx = tile
    oy = ox = halo
    if h < window:
        oy = min(halo, max(0, (h - 1) // 2))
        ty = max(1, h - 2 * oy)
    if w < window:
        ox = min(halo, max(0, (w - 1) // 2))
        tx = max(1, w - 2 * ox)

    grid = plan_grid(h, w, (ty, tx), (oy, ox))
    n = len(grid.ys) * len(grid.xs)

    if batch_size is None:
        # 8 balances conv models (ESRGAN: B=8 is +27% vs B=1) against
        # transformers (B>1 loses to VMEM pressure, see BENCHMARKS.md) and
        # bounds activation memory on huge tile grids; loaders can override
        # per-arch via SRModel.tile_batch — an int, or a {'f32': n,
        # 'bf16': m} dict when the sweet spot is dtype-dependent (ATD:
        # f32 tile rows are gather-bandwidth-bound and prefer smaller
        # batches than bf16, tools/sweep_tiled.py)
        tb = _resolve_dtype_hint(getattr(model, 'tile_batch', None), eff_dtype)
        batch_size = min(n, tb or 8)
    if mesh is not None:
        # tiles are sharded over the FIRST mesh axis only (see the
        # PartitionSpec in _make_fused_tiled_fn / the host loop); round the
        # batch to that axis's size, not the total device count
        dev = mesh.shape[mesh.axis_names[0]]
        batch_size = max(dev, batch_size - batch_size % dev)
    batch_size = min(batch_size, n) if mesh is None else batch_size
    return grid, batch_size


def _fused_for(model, grid: TileGrid, scale: int, batch_size: int, dtype_str: str,
               precision, mesh, unroll: int):
    """The LRU-cached one-dispatch tiled callable for a planned grid."""
    # Bounded LRU: each entry holds a jitted callable plus its compiled
    # executable, so unbounded growth when serving many distinct image
    # sizes without bucket=True would leak memory (advisor r2). Varied-
    # size serving beyond this bound should pass bucket=True.
    from collections import OrderedDict

    cache = model.__dict__.setdefault('_tiled_fn_cache', OrderedDict())
    mesh_key = None
    if mesh is not None:
        mesh_key = (mesh.axis_names, mesh.devices.shape,
                    tuple(d.id for d in mesh.devices.flat))
    from ..core.factory import _dispatch_flags

    key = (grid, batch_size, dtype_str, precision, mesh_key, unroll,
           _dispatch_flags())
    fused = cache.get(key)
    if fused is None:
        fused = _make_fused_tiled_fn(model, grid, scale, batch_size,
                                     precision, mesh, unroll)
        cache[key] = fused
        while len(cache) > _TILED_FN_CACHE_MAX:
            cache.popitem(last=False)
    else:
        cache.move_to_end(key)
    return fused


def tiled_program(model, h: int, w: int, *, tile: int | None = None,
                  halo: int | None = None,
                  batch_size: int | None = None, mesh=None, dtype=None,
                  precision: str | None = None, unroll: int = 1):
    """The single-dispatch tiled program for an (h, w, C) image.

    Returns ``(fn, scale)`` where ``fn(params, image)`` runs
    extract -> scan -> stitch exactly as ``upscale_tiled`` would (same grid
    planning, per-arch batch resolution, and jit cache), or ``(None, scale)``
    when the image fits in one window.  ``resselt_tpu.benchmark`` wraps
    ``fn`` in an on-device loop to time the driver without per-dispatch
    overhead; the fn is also reusable for ahead-of-time compile warming."""
    eff_dtype = dtype if dtype is not None else jnp.float32
    if tile is None:
        tile = _resolve_tile_hint(model, eff_dtype)
    if halo is None:
        halo = _resolve_halo_hint(model, tile, eff_dtype)
    scale = model.metadata.upscale
    if not isinstance(scale, int):
        raise ValueError('tiled driver requires an integer upscale factor')
    planned = _plan_tiled(model, h, w, tile, halo, batch_size, eff_dtype, mesh)
    if planned is None:
        return None, scale
    grid, batch_size = planned
    fn = _fused_for(model, grid, scale, batch_size, str(np.dtype(eff_dtype)),
                    precision, mesh, unroll)
    return fn, scale


def upscale_tiled(
    model,
    image,
    tile: int | None = None,
    halo: int | None = None,
    batch_size: int | None = None,
    mesh: 'jax.sharding.Mesh | None' = None,
    dtype=None,
    precision: str | None = None,
    on_device: bool | None = None,
    unroll: int = 1,
    bucket: bool = False,
):
    """Run an SRModel over a large image via overlap tiling.

    ``tile=None`` (default) uses the loader's measured per-arch sweet spot
    (``SRModel.serving_tile``, e.g. transformers 128-192) or 256.
    ``halo=None`` (default) likewise resolves ``SRModel.serving_halo``
    (seam-parity-gated sweep, tools/sweep_halo.py) or 16.

    ``image``: (H, W, C) in [0, 1].  When ``mesh`` is given, each tile batch
    is sharded over the mesh's first axis (data parallel over tiles).
    ``precision`` is forwarded to the model (see ``SRModel.__call__``).

    ``on_device`` (default True): run the entire tile loop inside ONE jitted
    program (``lax.scan`` over tile batches) — a single host->device
    dispatch per image instead of one per batch, which dominates wall-clock
    through a remote-TPU tunnel.  Set False for the per-batch host loop
    (per-tile progress logging, lower peak memory on huge grids).
    ``unroll`` unrolls the on-device scan (straight-line XLA) — try >1 if a
    large transformer body scans pathologically (see BENCHMARKS.md).

    ``bucket`` pads (H, W) up to the next tile multiples (reflect) and
    crops the output, so all image sizes in a bucket share ONE compiled
    grid instead of compiling per exact size — the serving analogue of
    ``upscale_padded``'s shape bucketing.  Interior output is unchanged;
    pixels within the model's receptive field of the pad seam can differ
    slightly from the model's own border handling."""
    eff_dtype = dtype if dtype is not None else jnp.float32
    if tile is None:
        # per-arch measured sweet spot (loader-set, sweep_tiled.json);
        # conv-model default 256
        tile = _resolve_tile_hint(model, eff_dtype)
    if halo is None:
        halo = _resolve_halo_hint(model, tile, eff_dtype)
    image = jnp.asarray(image)
    if image.ndim != 3:
        raise ValueError('upscale_tiled expects an HWC image')
    scale = model.metadata.upscale
    if not isinstance(scale, int):
        raise ValueError('tiled driver requires an integer upscale factor')

    h0, w0, _ = image.shape
    if bucket:
        image, _, _ = _pad_to_multiple_hw(image, tile)
        if image.shape[0] != h0 or image.shape[1] != w0:
            out = upscale_tiled(model, image, tile=tile, halo=halo,
                                batch_size=batch_size, mesh=mesh, dtype=dtype,
                                precision=precision, on_device=on_device,
                                unroll=unroll, bucket=False)
            return out[: h0 * scale, : w0 * scale, :]

    h, w, _ = image.shape
    planned = _plan_tiled(model, h, w, tile, halo, batch_size,
                          dtype if dtype is not None else image.dtype, mesh)
    if planned is None:
        return model(image, dtype=dtype, precision=precision)
    grid, batch_size = planned
    n = len(grid.ys) * len(grid.xs)

    if on_device is None:
        on_device = True
    if on_device:
        if image.dtype == jnp.uint8:
            image = image.astype(jnp.float32) / 255.0
        if dtype is not None:
            image = image.astype(dtype)
        elif image.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
            image = image.astype(jnp.float32)
        fused = _fused_for(model, grid, scale, batch_size, str(image.dtype),
                           precision, mesh, unroll)
        return fused(model.params, image)

    # host-loop path: one dispatch per tile batch (per-batch progress
    # logging; lower peak device memory on huge grids)
    tiles = _extract_tiles_jit(image, grid)
    outs = []
    verbose = logger.isEnabledFor(logging.DEBUG)
    for i in range(0, n, batch_size):
        chunk = tiles[i : i + batch_size]
        pad_n = batch_size - chunk.shape[0]
        if pad_n > 0:
            chunk = jnp.concatenate([chunk, jnp.repeat(chunk[-1:], pad_n, axis=0)])
        if mesh is not None:
            axis = mesh.axis_names[0]
            sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(axis))
            chunk = jax.device_put(chunk, sharding)
        t0 = time.perf_counter() if verbose else 0.0
        out = model(chunk, dtype=dtype, precision=precision)
        if pad_n > 0:
            out = out[: chunk.shape[0] - pad_n]
        outs.append(out)
        if verbose:
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            mp = out.shape[0] * out.shape[1] * out.shape[2] / 1e6
            logger.debug(
                'tiles %d-%d/%d: %.3fs (%.2f MP/s out, incl. any compile)',
                i + 1, i + out.shape[0], n, dt, mp / max(dt, 1e-9),
            )
    out_tiles = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
    return _stitch_tiles_jit(out_tiles, grid, scale)
