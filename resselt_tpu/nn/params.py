"""Param-tree access helpers.

Params are flat dicts keyed by checkpoint names.  ``PTree`` is a thin view
that scopes key prefixes so arch code reads like module code::

    p = PTree(params)
    y = F.conv2d(x, *p.conv('body.0'), padding='same')
"""

from __future__ import annotations

from typing import Mapping

from . import functional as F


class PTree:
    __slots__ = ('_d', '_prefix')

    def __init__(self, d: Mapping, prefix: str = ''):
        self._d = d
        self._prefix = prefix

    def sub(self, name) -> 'PTree':
        return PTree(self._d, f'{self._prefix}{name}.')

    def __getitem__(self, key: str):
        return self._d[self._prefix + str(key)]

    def get(self, key: str, default=None):
        return self._d.get(self._prefix + str(key), default)

    def __contains__(self, key: str) -> bool:
        return (self._prefix + str(key)) in self._d

    def keys(self):
        n = len(self._prefix)
        return [k[n:] for k in self._d.keys() if k.startswith(self._prefix)]

    # -- common module applications ------------------------------------
    def wb(self, name: str):
        """(weight, bias-or-None) pair for a submodule."""
        return self[f'{name}.weight'], self.get(f'{name}.bias')

    def conv(self, name: str, x, stride=1, padding=0, dilation=1, groups=1):
        w, b = self.wb(name)
        if str(w.dtype) == 'int8':  # quantized serving (resselt_tpu.quant)
            if groups != 1:
                raise ValueError(f'int8 conv {name!r} with groups={groups} (ineligible shape quantized?)')
            return F.conv2d_int8(x, w, self[f'{name}.weight_scale'], b,
                                 stride=stride, padding=padding, dilation=dilation)
        return F.conv2d(x, w, b, stride=stride, padding=padding, dilation=dilation, groups=groups)

    def linear(self, name: str, x):
        w, b = self.wb(name)
        return F.linear(x, w, b)

    def layer_norm(self, name: str, x, eps: float = 1e-5):
        return F.layer_norm(x, self.get(f'{name}.weight'), self.get(f'{name}.bias'), eps=eps)

    def batch_norm(self, name: str, x, eps: float = 1e-5):
        return F.batch_norm_2d(
            x,
            self[f'{name}.weight'],
            self[f'{name}.bias'],
            self[f'{name}.running_mean'],
            self[f'{name}.running_var'],
            eps=eps,
        )
