"""resselt_tpu — TPU-native single-image super-resolution framework.

JAX/XLA re-design of the resselt architecture-loader capability set:
checkpoint ingestion (.pth/.pt/.ckpt/.safetensors) without the torch
runtime, state-dict key-fingerprint auto-detection, shape-driven
hyperparameter inference, and NHWC JAX inference implementations of every
bundled SR architecture, with Pallas kernels on the hot paths and a
mesh-sharded tiled inference driver.

Public API mirrors the reference (resselt/__init__.py:6-26).
"""

from typing import Any, Mapping

from .archs import internal_registry
from .core import Architecture, ArchitectureNotFound, KeyCondition, ModelMetadata, Registry, SRModel

__version__ = '0.1.0'


def add(arch: Architecture) -> None:
    """Register a new architecture."""
    internal_registry.add(arch)


def get(uid: str) -> Architecture:
    """Get architecture by ID."""
    return internal_registry.get(uid)


def load_from_file(path: str) -> SRModel:
    """Detect and load a model from a checkpoint file."""
    return internal_registry.load_from_file(path)


def load_from_state_dict(state_dict: Mapping[str, Any]) -> SRModel:
    """Detect and load a model from an in-memory state dict."""
    return internal_registry.load_from_state_dict(state_dict)


def __getattr__(name):
    # convenience lazy re-exports of the heavier submodules
    if name in ('upscale_tiled', 'make_mesh'):
        from . import parallel

        return getattr(parallel, name)
    if name in ('save_model', 'load_model'):
        from . import cache

        return getattr(cache, name)
    raise AttributeError(name)


__all__ = [
    'add',
    'get',
    'load_from_file',
    'load_from_state_dict',
    'Architecture',
    'ArchitectureNotFound',
    'KeyCondition',
    'ModelMetadata',
    'Registry',
    'SRModel',
]
