"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

The TPU hot paths are the same traced code; tests validate numerics (float64,
parity with the reference CPU implementation) and multi-device sharding on
the host-platform device mesh.
"""

import os
import sys

# The remote-TPU (axon) bootstrap activates in sitecustomize — before this
# file runs — and with PALLAS_AXON_REMOTE_COMPILE every jit compiles on the
# remote service, whose pipeline silently breaks the error-free
# transformations of the two-float pipeline (measured: pair arithmetic
# 4e-14 -> 1.7e-8).  Tests must run on the plain local CPU backend, so if
# the bootstrap is active, re-exec the whole pytest process once with a
# sanitized environment.
if os.environ.get('PALLAS_AXON_POOL_IPS') and \
        not os.environ.get('PYIGA_TPU_TEST_REEXEC'):
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYIGA_TPU_TEST_REEXEC'] = '1'
    # '-s': the parent's stdout fd is already pytest's capture tempfile at
    # this point, so the re-exec'd run must not re-capture or its output
    # would vanish with the replaced process image
    os.execve(sys.executable,
              [sys.executable, '-m', 'pytest', '-s'] + sys.argv[1:], env)

# must be set before jax is imported anywhere; fast-math off because the
# XLA CPU backend's default LLVM fast-math breaks the two-float error-free
# transformations under jit (see pyiga_tpu/config.py)
_flags = os.environ.get('XLA_FLAGS', '')
for _flag in ('--xla_force_host_platform_device_count=8',
              '--xla_cpu_enable_fast_math=false'):
    if _flag.split('=')[0] not in _flags:
        _flags += ' ' + _flag
os.environ['XLA_FLAGS'] = _flags.strip()
# prefer the CPU platform in any environment where other backends exist
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax

jax.config.update('jax_enable_x64', True)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed_rng():
    np.random.seed(38219)
    yield
