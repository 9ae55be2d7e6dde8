"""Test config: run JAX on a virtual 8-device CPU mesh so sharding tests work
without TPU hardware, and keep tests hermetic/deterministic."""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

# the environment's sitecustomize force-registers a TPU PJRT plugin and
# overrides jax_platforms; reset it before any backend initializes.
jax.config.update('jax_platforms', 'cpu')

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
