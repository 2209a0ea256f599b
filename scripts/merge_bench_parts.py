#!/usr/bin/env python
"""Merge several bench.py output lines (one JSON object per line, each
from a SPARK_GRAFT_BENCH_ONLY chunk) into ONE artifact with the same
shape as a full bench.py line — used to assemble the sf1 headline
suite, whose 20 heaviest queries exceed a single invocation's timeout
budget when run together.

Usage: python scripts/merge_bench_parts.py PARTS.jsonl [SF] > OUT.json
"""

import json
import sys


def main() -> int:
    parts_path = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    queries = {}
    with open(parts_path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            queries.update(obj.get("queries") or {})
    out = {
        "metric": "headline_suite_seconds",
        "value": round(sum(queries.values()), 4),
        "unit": "sec",
        "queries": {k: queries[k] for k in sorted(queries)},
        "n_queries": len(queries),
        "cold": False,
        "sf": sf,
        "note": ("merged from per-chunk SPARK_GRAFT_BENCH_ONLY runs; "
                 "each chunk warms its own session, so values are "
                 "best-of-2 warm per query like the full suite"),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
