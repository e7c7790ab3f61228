#!/usr/bin/env python
"""Wipe the persistent XLA compilation cache used by pyiga_tpu.

The analog of the reference's scripts/clear-cache.py (which wipes its
on-disk compiled-module cache).  The cache directory is
``config.compile_cache_dir()`` (PYIGA_CACHE_DIR overrides; see
pyiga_tpu/config.py).
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from pyiga_tpu import config     # noqa: E402


def main():
    path = config.compile_cache_dir()
    if path is None:
        print('compilation cache disabled (PYIGA_COMPILE_CACHE=0)')
        return
    if os.path.isdir(path):
        n = sum(len(files) for _, _, files in os.walk(path))
        shutil.rmtree(path)
        print('removed %s (%d cached entries)' % (path, n))
    else:
        print('nothing to remove at %s' % path)


if __name__ == '__main__':
    main()
