"""Persistent XLA compilation cache helper.

Through the remote-TPU tunnel a first compile costs seconds to minutes;
the on-disk cache makes every later process start near-instant (measured
12.2s -> 0.5s for a small program).  The CLIs enable it by default;
library users opt in explicitly."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Default: ``$RESSELT_TPU_CACHE`` or ``~/.cache/resselt_tpu/xla``.
    Setting ``RESSELT_TPU_CACHE=`` (empty) disables.  Returns the directory
    used, or None when disabled."""
    if cache_dir is None:
        cache_dir = os.environ.get('RESSELT_TPU_CACHE', os.path.expanduser('~/.cache/resselt_tpu/xla'))
    if not cache_dir:
        return None
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    return cache_dir
