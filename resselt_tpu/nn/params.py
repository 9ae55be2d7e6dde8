"""Param-tree access helpers.

Params are flat dicts keyed by checkpoint names.  ``PTree`` is a thin view
that scopes key prefixes so arch code reads like module code::

    p = PTree(params)
    y = F.conv2d(x, *p.conv('body.0'), padding='same')
"""

from __future__ import annotations

from typing import Mapping

from . import functional as F

#: int8-eligibility discovery (resselt_tpu.quant): while set (to a dict with
#: 'safe'/'raw' key sets), param reads are recorded — ``PTree.conv`` marks
#: its weight int8-SAFE, any other read of a ``.weight`` key taints it.  A
#: key both safe and tainted stays float (it is consumed by a second,
#: non-int8-aware op).  Set only inside ``SRModel.quantize_int8``'s
#: eval_shape trace; None in normal operation.
_INT8_DISCOVERY = None


def record_int8_safe(full_key: str) -> None:
    """Mark a weight key as consumed by an int8-aware op (see PTree.conv);
    for arch code with a bespoke int8 path (e.g. esrgan._rdb)."""
    if _INT8_DISCOVERY is not None:
        _INT8_DISCOVERY['safe'].add(full_key)


def _record_raw(full_key: str) -> None:
    if _INT8_DISCOVERY is not None and full_key.endswith('.weight'):
        _INT8_DISCOVERY['raw'].add(full_key)


class PTree:
    __slots__ = ('_d', '_prefix')

    def __init__(self, d: Mapping, prefix: str = ''):
        self._d = d
        self._prefix = prefix

    def sub(self, name) -> 'PTree':
        return PTree(self._d, f'{self._prefix}{name}.')

    def __getitem__(self, key: str):
        k = self._prefix + str(key)
        _record_raw(k)
        return self._d[k]

    def get(self, key: str, default=None):
        k = self._prefix + str(key)
        if k in self._d:
            _record_raw(k)
        return self._d.get(k, default)

    def __contains__(self, key: str) -> bool:
        return (self._prefix + str(key)) in self._d

    def shape(self, key: str):
        """Shape-only read: does NOT count as consumption for int8
        discovery (trace-time geometry reads would otherwise taint conv
        weights that are actually consumed via ``conv``)."""
        return self._d[self._prefix + str(key)].shape

    def keys(self):
        n = len(self._prefix)
        return [k[n:] for k in self._d.keys() if k.startswith(self._prefix)]

    # -- common module applications ------------------------------------
    def wb(self, name: str):
        """(weight, bias-or-None) pair for a submodule."""
        return self[f'{name}.weight'], self.get(f'{name}.bias')

    def conv(self, name: str, x, stride=1, padding=0, dilation=1, groups=1):
        # direct reads (not __getitem__): this is the int8-aware consumer,
        # so its own access must record safe, not taint
        w = self._d[f'{self._prefix}{name}.weight']
        b = self._d.get(f'{self._prefix}{name}.bias')
        if groups == 1:
            record_int8_safe(f'{self._prefix}{name}.weight')
        if str(w.dtype) == 'int8':  # quantized serving (resselt_tpu.quant)
            if groups != 1:
                raise ValueError(f'int8 conv {name!r} with groups={groups} (ineligible shape quantized?)')
            return F.conv2d_int8(x, w, self[f'{name}.weight_scale'], b,
                                 stride=stride, padding=padding, dilation=dilation)
        return F.conv2d(x, w, b, stride=stride, padding=padding, dilation=dilation, groups=groups)

    def conv_weight_int8(self, name: str):
        """(weight, scale-or-None) with int8-SAFE discovery recording — for
        arch code implementing its own int8 path (e.g. esrgan._rdb)."""
        k = f'{self._prefix}{name}.weight'
        record_int8_safe(k)
        w = self._d[k]
        if str(w.dtype) == 'int8':
            return w, self._d[k + '_scale']
        return w, None

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
