"""Architecture registration with an explicit, deterministic order.

The reference registered archs in os.walk filesystem order
(resselt/archs/__init__.py:11-28), which silently ordered weak fingerprints
(spanplus's single-key detect, resselt/archs/spanplus/__init__.py:12) among
strong ones.  Here the order is an explicit list: strong fingerprints first,
weak ones last; a registry test asserts every family's synthetic state dict
is detected as itself.
"""

from __future__ import annotations

import importlib

from ..core import Registry

# Explicit registration order. Strong/unique fingerprints may appear in any
# order; weak ones (single-key detects) must come after anything they could
# shadow.
_ARCH_MODULES: list[str] = []

internal_registry = Registry()


def _register_all() -> None:
    for mod_name in _ARCH_MODULES:
        module = importlib.import_module(f'{__name__}.{mod_name}')
        internal_registry.add(module.ARCH)


def register_arch_module(mod_name: str) -> None:
    _ARCH_MODULES.append(mod_name)


# -- ordered family list (grows as families are implemented) ---------------
_ARCH_MODULES += [
    'swinir',
    'hat',
    'omni',
    'drct',
    'fdat',
    'dat',
    'rgt',
    'atd',
    'spanpp',
    'span',
    'esrgan',
    'plksr',
    'mosrv2',
    'moesr',
    'rtmosr',
    'smosr',
    'rha',
    'flexnet',
    'gaterv3',
    'gaterv2',
    'lawfft',
    'gfisrv2',
    'figsr',
    'gfisr',
    'gater',
    'cugan',
    'rcan',
    'eimn',
    'mosr',
    'compact',
    'spanplus',  # weak single-key fingerprint in the reference; keep late as more archs land
]

_register_all()
