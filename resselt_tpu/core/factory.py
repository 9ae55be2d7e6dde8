"""Architecture contract: detection conditions, metadata, and the SRModel
runtime object returned by the loaders.

Mirrors the reference contract (resselt/factory/arch.py:12-36,
resselt/factory/key_condition.py:6-33) with a JAX-native model object:
params are a state-dict-shaped pytree of jnp arrays and the forward pass is
a pure, jit-compiled function of ``(params, x)``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Literal, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class KeyCondition:
    """Recursive boolean key-presence predicate over a state dict
    (reference: resselt/factory/key_condition.py:6-33)."""

    def __init__(self, kind: Literal['all', 'any'], keys: tuple['str | KeyCondition', ...]):
        self._kind = kind
        self._keys = keys

    @staticmethod
    def has_all(*keys: 'str | KeyCondition') -> 'KeyCondition':
        return KeyCondition('all', keys)

    @staticmethod
    def has_any(*keys: 'str | KeyCondition') -> 'KeyCondition':
        return KeyCondition('any', keys)

    def __call__(self, state_dict: Mapping[str, Any]) -> bool:
        def check(key: 'str | KeyCondition') -> bool:
            if isinstance(key, KeyCondition):
                return key(state_dict)
            return key in state_dict

        op = all if self._kind == 'all' else any
        return op(check(k) for k in self._keys)


@dataclass
class ModelMetadata:
    """SR model metadata attached to every loaded model
    (reference: resselt/factory/arch.py:12-19)."""

    in_channels: int
    out_channels: int
    upscale: int | Sequence[int]
    name: str


def _dispatch_flags() -> tuple:
    """Current trace-time kernel-dispatch settings, used as jit cache keys."""
    from ..nn.functional import block_diag_groups_enabled
    from ..nn.spectral import mm_dft_enabled
    from ..nn.window import (
        chunked_attention_enabled, fused_attention_enabled, packed_attention_enabled,
    )
    from ..ops.fused_conv import fused_lk_enabled
    from ..ops.molrcm import fused_molrcm_enabled

    return (fused_attention_enabled(), fused_lk_enabled(), packed_attention_enabled(),
            fused_molrcm_enabled(), mm_dft_enabled(), block_diag_groups_enabled(),
            chunked_attention_enabled())


def _to_jax_params(params: Mapping[str, np.ndarray]):
    out = {}
    for k, v in params.items():
        arr = np.asarray(v)
        if arr.dtype.kind == 'f' and arr.dtype.itemsize != 4:
            arr = arr.astype(np.float32)
        elif arr.dtype.name == 'bfloat16':
            arr = arr.astype(np.float32)
        out[k] = jnp.asarray(arr)
    return out


class SRModel:
    """A loaded super-resolution model.

    * ``params``: flat dict of jnp arrays keyed by the (transformed)
      checkpoint names, torch tensor layouts preserved (conv = OIHW,
      linear = (out, in)); layout adaptation happens inside the nn helpers.
    * ``apply_fn(config, params, x)``: pure function, ``x`` is NHWC float.
    * ``__call__``: jit-compiled, shape-specializing entry point.
    """

    def __init__(
        self,
        arch_id: str,
        config: Any,
        params: Mapping[str, np.ndarray],
        metadata: ModelMetadata,
        apply_fn: Callable[[Any, Mapping[str, jax.Array], jax.Array], jax.Array],
    ):
        self.arch_id = arch_id
        self.config = config
        self.params = _to_jax_params(params)
        self.parameters_info = metadata  # reference attribute name
        self.metadata = metadata
        # loader-set hint for the tiled driver's per-dispatch tile batch:
        # conv models gain from batch 8 (MXU saturation), some transformers
        # lose to VMEM pressure and prefer 1-2 (BENCHMARKS.md).  An int, or
        # a {'f32': n, 'bf16': m} dict when the optimum is dtype-dependent
        # (parallel/tiling.py resolves it against the serving dtype).
        self.tile_batch: int | dict | None = None
        # loader-set hint for the tiled driver's tile size: transformers
        # measure fastest well below the conv default of 256 (end-to-end
        # sweep in sweep_tiled.json).  An int, or a per-dtype dict like
        # tile_batch.  None = use the driver default.
        self.serving_tile: int | dict | None = None
        # loader-set hint for the tiled driver's halo (overlap): measured
        # per-arch by tools/sweep_halo.py under a seam-parity gate — halo
        # recompute is (window^2 - tile^2)/tile^2 extra work per tile
        # (~56% at t128 h16), so the smallest halo that keeps seams
        # invisible is the serving optimum.  An int, or a per-dtype dict
        # like tile_batch (ATD: bf16 prefers 8, f32 16 — the 13-window
        # t192+2*8 grid is an XLA pathology only in f32, sweep_halo.json).
        # None = driver default 16.
        self.serving_halo: int | dict | None = None
        # loader-set spatial-geometry multiple: the model internally pads
        # (H, W) up to multiples of this (attention window size, max split
        # size, unshuffle factor, or their lcm).  The tiled driver uses it
        # to derive a window-aligned halo for tiles the halo sweep never
        # visited (parallel/tiling._resolve_halo_hint): a tile window that
        # is not a multiple forces an internal re-pad on EVERY tile — the
        # hat t192 h4/h12 sweep anomaly (sweep_halo.json).  None = no
        # internal spatial padding (plain conv archs).
        self.size_multiple: int | None = None
        self._apply_fn = apply_fn

        # kernel-dispatch flags (e.g. nn.window.use_fused_attention) are
        # read at TRACE time; passing them as ignored static args keys the
        # jit cache on them so flipping a flag retraces instead of silently
        # reusing an executable compiled under the old setting
        def _apply(flags, params, x):
            del flags
            return apply_fn(config, params, x)

        self._jitted = jax.jit(_apply, static_argnums=0)

        def _apply_prec(flags, prec, params, x):
            del flags
            with jax.default_matmul_precision(prec):
                return apply_fn(config, params, x)

        self._jitted_prec = jax.jit(_apply_prec, static_argnums=(0, 1))

    @property
    def upscale(self) -> int | Sequence[int]:
        return self.metadata.upscale

    def with_config(self, **overrides) -> 'SRModel':
        """New SRModel sharing these params with config fields replaced.

        Example: pick a different scale on an arbitrary-scale SpanPP
        checkpoint (reference runs base_scale unless the caller passes one,
        resselt/archs/spanpp/arch.py:358-373):

            model3x = model.with_config(eval_scale=3)
        """
        import dataclasses

        cfg = dataclasses.replace(self.config, **overrides)
        meta = self.metadata
        if 'eval_scale' in overrides:
            # eval_scale picks the effective output scale on an arbitrary-
            # scale checkpoint; narrow metadata.upscale (which may be the
            # full scale list) so downstream geometry users — the tiled /
            # padded drivers size output buffers from it — see the int
            # actually produced.
            meta = dataclasses.replace(meta, upscale=int(overrides['eval_scale']))
        clone = SRModel(self.arch_id, cfg, {}, meta, self._apply_fn)
        clone.params = self.params
        clone.tile_batch = self.tile_batch
        clone.serving_tile = self.serving_tile
        clone.serving_halo = self.serving_halo
        clone.size_multiple = self.size_multiple
        return clone

    def apply(self, params, x: jax.Array) -> jax.Array:
        """Un-jitted forward (for composition under an outer jit/shard_map)."""
        return self._apply_fn(self.config, params, x)

    def quantize_int8(self) -> 'SRModel':
        """Opt-in int8 serving copy (resselt_tpu.quant): eligible conv
        weights become per-channel int8 (+ dynamic activation quant at
        apply time, ~2x MXU rate).  Explicitly lossy — quality cost per
        family in bench_int8.md; raises if nothing is eligible.

        Eligibility = shape (plain conv, cin/cout >= 32) AND consumption:
        a zero-cost ``eval_shape`` discovery trace records which weights
        flow exclusively through int8-aware ops (``PTree.conv`` with
        groups=1, esrgan's producer RDB); weights consumed by transposed
        convs, grouped convs, or raw ``F.conv2d`` calls stay float."""
        from ..nn import params as _params_mod
        from ..quant import quantize_params

        rec = {'safe': set(), 'raw': set()}
        probe = jax.ShapeDtypeStruct((1, 64, 64, self.metadata.in_channels), jnp.float32)
        _params_mod._INT8_DISCOVERY = rec
        try:
            jax.eval_shape(functools.partial(self._apply_fn, self.config), self.params, probe)
        finally:
            _params_mod._INT8_DISCOVERY = None

        q, n = quantize_params(
            {k: np.asarray(v) for k, v in self.params.items()},
            allowed=rec['safe'] - rec['raw'],
        )
        if n == 0:
            raise ValueError(f'{self.arch_id}: no int8-eligible conv weights')
        clone = SRModel(self.arch_id, self.config, q, self.metadata, self._apply_fn)
        clone.tile_batch = self.tile_batch
        clone.serving_tile = self.serving_tile
        clone.serving_halo = self.serving_halo
        clone.size_multiple = self.size_multiple
        return clone

    def cost(self, height: int, width: int, batch: int = 1) -> dict:
        """Compiled-graph cost analysis for one forward at the given size.

        The TPU-native replacement for the reference's hand-written
        ``flops()`` estimators (e.g. resselt/archs/swinir/arch.py:1017-1024):
        XLA reports the actual FLOPs/bytes of the optimized program."""
        c = self.metadata.in_channels
        shape = jax.ShapeDtypeStruct((batch, height, width, c), jnp.float32)
        compiled = jax.jit(functools.partial(self._apply_fn, self.config)).lower(self.params, shape).compile()
        (analysis,) = [a for a in [compiled.cost_analysis()] if a is not None] or [{}]
        if isinstance(analysis, list):  # older jax returns a per-device list
            analysis = analysis[0] if analysis else {}
        return {
            'flops': float(analysis.get('flops', -1.0)),
            'bytes_accessed': float(analysis.get('bytes accessed', -1.0)),
            'params': int(sum(int(np.prod(v.shape)) for v in self.params.values())),
        }

    def __call__(self, x, dtype=None, precision: str | None = None) -> jax.Array:
        """Run the model on an NHWC (or HWC) image batch.

        Float inputs are expected in [0, 1]; uint8 images are converted
        automatically.  ``precision``: None uses the device default (on TPU,
        f32 matmuls/convs run as fast bf16 MXU passes); ``'highest'`` forces
        full-f32 accumulation (~3x MXU cost) for bit-accuracy-critical runs;
        ``'tensorfloat32'``/``'bfloat16'`` select intermediate modes."""
        x = jnp.asarray(x)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        if dtype is not None:
            x = x.astype(dtype)
        elif x.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
            x = x.astype(jnp.float32)
        flags = _dispatch_flags()
        if precision is None:
            y = self._jitted(flags, self.params, x)
        else:
            y = self._jitted_prec(flags, precision, self.params, x)
        return y[0] if squeeze else y


@dataclass
class Architecture:
    """Detection + loading adapter for one architecture family
    (reference: resselt/factory/arch.py:22-36)."""

    id: str
    detect_condition: KeyCondition = field(repr=False)
    load_fn: Callable[[Mapping[str, np.ndarray]], SRModel] = field(repr=False)

    def detect(self, state_dict: Mapping[str, Any]) -> bool:
        return self.detect_condition(state_dict)

    def load(self, state_dict: Mapping[str, Any]) -> SRModel:
        return self.load_fn(state_dict)
