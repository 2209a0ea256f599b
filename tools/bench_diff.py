#!/usr/bin/env python
"""Compare two bench JSON files (or raw bench.py output lines) key by
key: per-query deltas, aggregate over common keys, and regressions
above a threshold.

Usage: python tools/bench_diff.py OLD.json NEW.json [ratio_threshold]

Accepts either the driver's BENCH_r{N}.json wrapper ({"parsed": {...}}
or {"tail": "..."} forms) or a bare {"queries": {...}} line.
"""

import json
import re
import sys


def _load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    tail = d.get("tail", "")
    # recover the LAST complete {"metric": ...} json object in the tail
    best = {}
    for m in re.finditer(r'\{"metric".*?\}\}', tail):
        try:
            best = json.loads(m.group(0)).get("queries", best)
        except ValueError:
            pass
    if best:
        return best
    # fall back: per-key scrape from a truncated dict body
    return {k: float(v) for k, v in
            re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)
            if not k.startswith(("metric", "value", "sf", "n_"))}


def main():
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    if not common:
        print("no common keys")
        return 1
    so, sn = sum(old[k] for k in common), sum(new[k] for k in common)
    print(f"{len(common)} common keys: old {so:.2f}s -> new {sn:.2f}s "
          f"({so / sn:.2f}x {'faster' if sn < so else 'slower'})")
    regress = [(k, old[k], new[k]) for k in common
               if new[k] > old[k] * thresh and new[k] - old[k] > 0.2]
    improve = [(k, old[k], new[k]) for k in common
               if old[k] > new[k] * thresh and old[k] - new[k] > 0.2]
    if regress:
        print(f"\nregressions (> {thresh}x and > 0.2s):")
        for k, a, b in sorted(regress, key=lambda t: t[1] - t[2]):
            print(f"  {k}: {a:.2f} -> {b:.2f}")
    if improve:
        print("\nimprovements:")
        for k, a, b in sorted(improve, key=lambda t: t[1] - t[2],
                              reverse=True):
            print(f"  {k}: {a:.2f} -> {b:.2f}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"\nnew keys ({len(only_new)}): "
              + ", ".join(f"{k}={new[k]:.2f}" for k in only_new))
    return 0


if __name__ == "__main__":
    sys.exit(main())
