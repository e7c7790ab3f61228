#!/usr/bin/env python
"""Tabulate the per-round benchmark artifacts (BENCH_r*.json) that the
build driver records at the end of every round."""

import glob
import json
import os
import re
import sys


def main():
    root = os.path.join(os.path.dirname(__file__), '..')
    rows = []
    for path in sorted(glob.glob(os.path.join(root, 'BENCH_r*.json'))):
        rnd = re.search(r'BENCH_r(\d+)', path).group(1)
        try:
            rec = json.load(open(path))
        except Exception as e:
            print('%s: unreadable (%s)' % (path, e), file=sys.stderr)
            continue
        parsed = rec.get('parsed') or {}
        rows.append((int(rnd), parsed.get('metric', '?'),
                     parsed.get('value'), parsed.get('vs_baseline')))
    if not rows:
        print('no BENCH_r*.json artifacts found')
        return
    print('%-6s %-55s %12s %12s' % ('round', 'metric', 'value',
                                    'vs_baseline'))
    for rnd, metric, value, vs in rows:
        print('%-6d %-55s %12s %12s' % (rnd, metric, value, vs))


if __name__ == '__main__':
    main()
