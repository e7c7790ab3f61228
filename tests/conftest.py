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
_NEEDS_REEXEC = bool(os.environ.get('PALLAS_AXON_POOL_IPS')) and \
    not os.environ.get('PYIGA_TPU_TEST_REEXEC')

if _NEEDS_REEXEC:
    # Re-exec from pytest_configure, NOT at conftest-import time: initial
    # conftests load while pytest's fd-capture has fd 1/2 redirected to a
    # capture tempfile, so an execve here would hand the child that
    # tempfile as stdout and every line of test output would vanish.  At
    # pytest_configure the global capture is suspended (original fds
    # restored), so the child inherits the real stdout/stderr.
    def pytest_configure(config):
        capman = config.pluginmanager.get_plugin('capturemanager')
        if capman is not None:
            try:
                capman.stop_global_capturing()
            except Exception:
                pass
        env = dict(os.environ)
        env.pop('PALLAS_AXON_POOL_IPS', None)
        env['JAX_PLATFORMS'] = 'cpu'
        env['PYIGA_TPU_TEST_REEXEC'] = '1'
        os.execve(sys.executable,
                  [sys.executable, '-m', 'pytest'] + sys.argv[1:], env)
else:
    # must be set before jax is imported anywhere; fast-math off because
    # the XLA CPU backend's default LLVM fast-math breaks the two-float
    # error-free transformations under jit (see pyiga_tpu/config.py)
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
