#!/usr/bin/env python
"""Rebuild the per-round builder bench artifact from a bench.py log.

Usage: python scripts/bench_artifact.py LOGFILE OUT.json [NOTE]

Collects every JSON metric line printed by ``python bench.py`` (the
final re-printed block wins over earlier duplicates, keyed by metric
name) and writes the driver-shaped artifact with provenance."""
import json
import sys


def collect(path):
    results = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith('{"metric"'):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            results[rec['metric']] = rec      # later lines win
    return list(results.values())


def main():
    log, out = sys.argv[1], sys.argv[2]
    note = sys.argv[3] if len(sys.argv) > 3 else (
        'builder (cold fresh-process python bench.py on the v5e)')
    results = collect(log)
    if not results:
        sys.exit('no metric lines found in ' + log)
    art = {'round': 5, 'produced_by': note, 'results': results}
    with open(out, 'w') as f:
        json.dump(art, f, indent=1)
        f.write('\n')
    print('wrote %s (%d metric lines)' % (out, len(results)))
    for r in results:
        print(' ', r['metric'], '->', r['value'], r['unit'],
              '| vs_baseline', r.get('vs_baseline'))


if __name__ == '__main__':
    main()
