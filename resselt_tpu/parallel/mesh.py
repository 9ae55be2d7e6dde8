"""Device-mesh utilities: data-parallel and tensor-parallel shardings.

The reference has no distributed code (SURVEY.md §5); this module defines
the TPU-native scaling story: a ``Mesh`` over (dp, tp), batch sharded over
dp, wide channel dimensions of conv/linear weights sharded over tp, with
XLA inserting the collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None, tp: int = 1, axis_names=('dp', 'tp')) -> Mesh:
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    if dp is None:
        dp = devices.size // tp
    return Mesh(devices[: dp * tp].reshape(dp, tp), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = 'dp') -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def param_sharding(mesh: Mesh, params: dict, tp_axis: str = 'tp', min_size: int = 1 << 16) -> dict:
    """Tensor-parallel sharding spec for a state-dict-shaped param tree.

    Shards the output-channel dim (dim 0) of large conv/linear weights and
    their biases over ``tp_axis`` when evenly divisible; everything else is
    replicated.  Returns {key: NamedSharding}."""
    tp = mesh.shape[tp_axis]
    out = {}
    for k, v in params.items():
        spec = P()
        if tp > 1 and hasattr(v, 'shape') and v.ndim >= 1 and v.size >= min_size:
            if v.shape[0] % tp == 0:
                spec = P(tp_axis)
        out[k] = NamedSharding(mesh, spec)
    return out


def shard_params(mesh: Mesh, params: dict, **kw) -> dict:
    shardings = param_sharding(mesh, params, **kw)
    return {k: jax.device_put(v, shardings[k]) for k, v in params.items()}
