"""Converted-model cache: save/load an SRModel's transformed params.

Loading a torch checkpoint involves pickle parsing, reparam collapses and
(for SpanPP) kernel synthesis; this caches the post-transform state so
production serving can skip all of it (SURVEY.md §5 checkpoint row).

Format: a single ``.npz`` holding the param arrays plus a JSON header with
the arch id, config dataclass fields, and metadata.
"""

from __future__ import annotations

import dataclasses
import importlib
import json

import numpy as np

from .core import ModelMetadata, SRModel

_FORMAT_VERSION = 1


def save_model(model: SRModel, path: str) -> None:
    """Serialize a loaded model (transformed params + config) to ``path``."""
    cfg = model.config
    header = {
        'format_version': _FORMAT_VERSION,
        'arch_id': model.arch_id,
        'config_module': type(cfg).__module__,
        'config_class': type(cfg).__name__,
        'config': dataclasses.asdict(cfg),
        'metadata': {
            'in_channels': model.metadata.in_channels,
            'out_channels': model.metadata.out_channels,
            'upscale': model.metadata.upscale,
            'name': model.metadata.name,
        },
        # loader-set serving hints (measured per-arch sweet spots) must
        # survive the cache round-trip — the cache path exists FOR serving
        'tile_batch': model.tile_batch,
        'serving_tile': model.serving_tile,
        'serving_halo': model.serving_halo,
        'size_multiple': model.size_multiple,
    }
    arrays = {k: np.asarray(v) for k, v in model.params.items()}
    np.savez(path, __header__=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8), **arrays)


def _restore_tuples(cls, values: dict):
    """dataclasses.asdict turns tuples into lists; restore per-field types."""
    out = {}
    hints = {f.name: f.type for f in dataclasses.fields(cls)}
    for k, v in values.items():
        if isinstance(v, list) and 'tuple' in str(hints.get(k, '')):
            out[k] = tuple(v)
        else:
            out[k] = v
    return out


def load_model(path: str) -> SRModel:
    """Load a model saved with :func:`save_model`."""
    data = np.load(path)
    header = json.loads(bytes(data['__header__']).decode())
    if header['format_version'] != _FORMAT_VERSION:
        raise ValueError(f'Unsupported cache format version {header["format_version"]}')

    # A hostile cache file must not be able to import arbitrary modules
    # (import alone executes code): only registered arch modules qualify.
    mod_name = header['config_module']
    if not isinstance(mod_name, str) or not mod_name.startswith('resselt_tpu.archs.'):
        raise ValueError(f'Cache header names a non-architecture module: {mod_name!r}')
    module = importlib.import_module(mod_name)
    cfg_cls = getattr(module, header['config_class'])
    if not (dataclasses.is_dataclass(cfg_cls) and callable(getattr(module, 'apply', None))):
        raise ValueError(f'{mod_name}.{header["config_class"]} is not an architecture config')
    cfg = cfg_cls(**_restore_tuples(cfg_cls, header['config']))

    params = {k: data[k] for k in data.files if k != '__header__'}
    meta = ModelMetadata(**header['metadata'])
    apply_fn = module.apply
    model = SRModel(header['arch_id'], cfg, params, meta, apply_fn)
    model.tile_batch = header.get('tile_batch')
    model.serving_tile = header.get('serving_tile')
    model.serving_halo = header.get('serving_halo')
    model.size_multiple = header.get('size_multiple')
    return model
