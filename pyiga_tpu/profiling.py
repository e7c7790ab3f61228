# -*- coding: utf-8 -*-
"""Lightweight timing and profiling helpers.

The reference has no built-in profiling beyond ACA's verbose pivot log and
tqdm progress bars (SURVEY 5.1); the TPU-native equivalents here are

* :func:`timed` / :class:`Timings` — wall-clock phase timers with correct
  device synchronization (``block_until_ready`` returns before execution
  finishes on tunneled backends, so a result to sync on may be passed);
* :func:`trace` — a ``jax.profiler`` trace context writing a TensorBoard-
  readable profile directory (no-op if the profiler is unavailable on the
  backend).
"""

import contextlib
import time

import numpy as np


class Timings:
    """Accumulates named phase timings; ``report()`` prints a table."""

    def __init__(self):
        self.records = {}

    def add(self, label, seconds):
        self.records.setdefault(label, []).append(seconds)

    @contextlib.contextmanager
    def __call__(self, label, sync=None):
        with _timed_box(sync) as box:
            yield box
        self.add(label, box['seconds'])

    def report(self, stream=None):
        import sys
        out = stream or sys.stdout
        for label, ts in self.records.items():
            ts = np.asarray(ts)
            out.write('%-32s %3d calls  best %8.2f ms  mean %8.2f ms\n'
                      % (label, len(ts), 1e3 * ts.min(), 1e3 * ts.mean()))


def _device_sync(result):
    """Force execution to finish: fetch one scalar derived from `result`
    (``block_until_ready`` alone returns early on tunneled backends)."""
    import jax

    for x in jax.tree_util.tree_leaves(result):
        if hasattr(x, 'dtype') and np.ndim(x):
            # slice ON DEVICE first: np.asarray(x) would pull the whole
            # buffer through the ~12 MB/s tunnel (e.g. ~25 s for the n=48
            # compact tensor), dominating the measured time
            np.asarray(x.ravel()[0] if hasattr(x, 'ravel') else x)
        elif hasattr(x, 'dtype'):
            np.asarray(x)
    return result


@contextlib.contextmanager
def _timed_box(sync):
    """Shared timing protocol of :func:`timed` and :class:`Timings`:
    device-synchronize on the block's result, record elapsed seconds."""
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        result = box.get('result', sync)
        if result is not None:
            _device_sync(result)
        box['seconds'] = time.perf_counter() - t0


@contextlib.contextmanager
def timed(label='elapsed', sync=None, verbose=True):
    """Time a block; pass ``sync=result`` (or set ``box['result']``) to
    synchronize on device values before stopping the clock.

    >>> with timed('assembly') as box:
    ...     box['result'] = asm.assemble()
    """
    with _timed_box(sync) as box:
        yield box
    if verbose:
        print('%s: %.2f ms' % (label, 1e3 * box['seconds']))


@contextlib.contextmanager
def trace(logdir):
    """``jax.profiler`` trace context (TensorBoard format); degrades to a
    no-op when the profiler is not supported by the active backend."""
    import jax

    try:
        jax.profiler.start_trace(str(logdir))
        started = True
    except Exception as e:          # tunneled/experimental backends
        print('profiler trace unavailable: %s' % e)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
