"""Architecture registry with deterministic, explicit ordering.

Fixes two latent reference issues flagged in SURVEY.md:
* registration order was implicit ``os.walk`` filesystem order
  (resselt/archs/__init__.py:11-28); here the order is an explicit list so
  weak fingerprints (e.g. spanplus's single key,
  resselt/archs/spanplus/__init__.py:12) sit after stronger ones.
* ``Registry.get`` raised ``KeyError`` instead of the typed error
  (resselt/registry.py:73-77).
"""

from __future__ import annotations

import logging
from typing import Any, Iterator, Mapping

from ..io import load_state_dict_from_file
from .factory import Architecture, SRModel
from .state_dict import canonicalize_state_dict


logger = logging.getLogger('resselt_tpu.registry')


class ArchitectureNotFound(Exception):
    pass


class Registry:
    def __init__(self):
        self.store: dict[str, Architecture] = {}

    def __contains__(self, uid: str) -> bool:
        return uid in self.store

    def __iter__(self) -> Iterator[Architecture]:
        return iter(list(self.store.values()))

    def __len__(self) -> int:
        return len(self.store)

    def add(self, arch: Architecture) -> None:
        self.store[arch.id] = arch

    def get(self, uid: str) -> Architecture:
        try:
            return self.store[uid]
        except KeyError:
            raise ArchitectureNotFound(uid) from None

    def load_from_file(self, path: str) -> SRModel:
        state_dict = load_state_dict_from_file(path)
        return self.load_from_state_dict(state_dict)

    def load_from_state_dict(self, state_dict: Mapping[str, Any]) -> SRModel:
        state_dict = canonicalize_state_dict(state_dict)

        for architecture in self.store.values():
            if architecture.detect(state_dict):
                model = architecture.load(state_dict)
                logger.info(
                    'detected %s (%s): upscale=%s in=%d out=%d, %d params',
                    architecture.id, model.metadata.name, model.metadata.upscale,
                    model.metadata.in_channels, model.metadata.out_channels, len(model.params),
                )
                return model

        raise ArchitectureNotFound(
            'No registered architecture matches the checkpoint key fingerprint '
            f'({len(state_dict)} keys).'
        )
