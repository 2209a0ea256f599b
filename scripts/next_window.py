#!/usr/bin/env python
"""Emit the recommended CORRECTNESS window for the NEXT round.

The driver's gate records only the FIRST 50 entries of
``__spark_entry__.queries()``, so the ordering in ``_ROUND_PRIORITY``
decides which operators get a driver oracle row each round. The
rotation policy (every verdict audits it) is:

  tier 0 — entries RED or errored in any cumulative CORRECTNESS_r*.json
           whose failure was never superseded by a later green row;
  tier 1 — entries that have NEVER had a driver row (newest landings),
           ordered by registry position (landing order);
  tier 2 — green entries, STALEST driver proof first (round of last
           green row ascending), to bound proof staleness.

This script derives all three mechanically from the cumulative
CORRECTNESS_r*.json files plus the live registry and prints a
paste-ready python list (50 entries). Run it at the START of a round,
paste into _ROUND_PRIORITY, and the hand-curated comment rotation
becomes a readout. (scripts/vanilla_harness.py --stale separately
flags entries whose BODY changed since their last local green run —
put any of those into tier 0 by hand if the change was behavioral.)
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> int:
    import __spark_entry__ as entry

    registry = list(entry.queries())  # priority order, incl. old window
    # landing order = RELATIONAL_QUERIES/PIPELINE insertion order,
    # reconstructable from the unprioritized union:
    from datafusion_async_parquet_index_spark.operators import (
        PIPELINE_QUERIES,
    )
    from datafusion_async_parquet_index_spark.queries import (
        RELATIONAL_QUERIES,
    )
    landing = list(RELATIONAL_QUERIES) + [
        k for k in PIPELINE_QUERIES if k not in RELATIONAL_QUERIES]

    last_green = {}   # name -> round of most recent green row
    last_red = {}     # name -> round of most recent red/err row
    for path in sorted(glob.glob(
            os.path.join(os.path.dirname(__file__), "..",
                         "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, rec in rows.items():
            ok = (isinstance(rec, dict) and rec.get("rows_match")
                  and rec.get("hash_match", True) and not rec.get("err"))
            (last_green if ok else last_red)[name] = rnd

    tier0 = [n for n in landing
             if n in last_red and last_red[n] >= last_green.get(n, -1)]
    tier1 = [n for n in landing
             if n not in last_green and n not in tier0]
    tier2 = sorted((n for n in landing if n in last_green
                    and n not in tier0),
                   key=lambda n: (last_green[n], landing.index(n)))

    out = (tier0 + tier1 + tier2)[:WINDOW]
    print(f"# tier0 (unresolved red): {len(tier0)}; "
          f"tier1 (never proven): {len(tier1)}; "
          f"tier2 (stalest green first): window fills to {WINDOW}")
    print("_ROUND_PRIORITY = [")
    for n in out:
        tag = ("red" if n in tier0 else
               "never" if n in tier1 else
               f"green r{last_green[n]}")
        print(f'    "{n}",  # {tag}')
    print("]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
