"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

The TPU hot paths are the same traced code; tests validate numerics (float64,
parity with the reference CPU implementation) and multi-device sharding on
the host-platform device mesh.
"""

import os

# must be set before jax is imported anywhere
os.environ.setdefault('XLA_FLAGS',
                      '--xla_force_host_platform_device_count=8')

import jax

jax.config.update('jax_enable_x64', True)
try:
    # the axon/TPU plugin may register a TPU even under JAX_PLATFORMS=cpu;
    # pin the default device to CPU so tests never round-trip the tunnel.
    jax.config.update('jax_default_device', jax.devices('cpu')[0])
except RuntimeError:
    pass

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed_rng():
    np.random.seed(38219)
    yield
