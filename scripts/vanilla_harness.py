#!/usr/bin/env python
"""Driver-shaped correctness check: run every __spark_entry__.queries()
entry on a VANILLA SparkSession (no session.py factory, no tuned confs —
exactly what the driver's harness does) and compare against the DuckDB
oracle_sql() at sf0.01.

This is the local reproduction of the gate that produced
CORRECTNESS_r01.json's missing/err rows: bench and pytest both use our
tuned session factory, so a query can be green there yet die in the
driver (e.g. events.parquet's TIMESTAMP(NANOS) needing
spark.sql.legacy.parquet.nanosAsLong).  Run this before trusting any
query as "done".

Usage:
    python scripts/vanilla_harness.py [sf_dir] [query ...]
    python scripts/vanilla_harness.py --stale

Stale-green tripwire (``--stale``): every green run records a
fingerprint per query — sha256 of the query callable's source plus its
oracle SQL — into scripts/green_hashes.json. ``--stale`` compares the
CURRENT fingerprints against the recorded ones without starting Spark
and exits 1 listing every query whose body or oracle changed (or was
never green-recorded) since its last green run. That list IS the next
correctness window's tier 1: rotation stops being a hand-curated
comment and becomes a mechanical readout. (Granularity is the query
function's own source — a change to shared engine code doesn't flood
the list; the golden-parity + property tests cover those paths every
round.)
"""

import hashlib
import inspect
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            if isinstance(v, list):
                v = tuple(round(x, 4) if isinstance(x, float) else x
                          for x in v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


HASH_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "green_hashes.json")


def _fingerprint(fn, oracle_sql):
    """sha256 of the query callable's source + its oracle SQL — the
    change signal the stale tripwire compares."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    h = hashlib.sha256()
    h.update(src.encode())
    h.update((oracle_sql or "").encode())
    return h.hexdigest()


def _load_green_hashes():
    try:
        with open(HASH_FILE) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def stale_check():
    """Compare current fingerprints vs the green-recorded ones; print
    the stale set (= the next window's tier 1) and exit 1 if any."""
    import __spark_entry__ as entry_mod
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    recorded = _load_green_hashes()
    stale = [n for n in queries
             if recorded.get(n) != _fingerprint(queries[n], oracles.get(n))]
    if not stale:
        print(f"0/{len(queries)} stale — every registered query's body "
              "and oracle are unchanged since their last green run")
        return 0
    print(f"{len(stale)}/{len(queries)} STALE (changed or never "
          "green-recorded since last green run) — next window tier 1:")
    for n in stale:
        print(f"  {n}")
    return 1


def main():
    if "--stale" in sys.argv[1:]:
        sys.exit(stale_check())
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Vanilla session: the ONLY things we set are master/memory — no SQL
    # confs, mirroring the driver harness.
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("vanilla-harness")
             .config("spark.driver.memory", "8g")
             .getOrCreate())

    import __spark_entry__ as entry_mod
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    results = {}
    failed = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "err": None}
        try:
            sdf = queries[name](spark, sf_dir)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(rows)
            if name in oracles:
                con = _duck(sf_dir)
                res = con.execute(oracles[name])
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(rows) == len(orows)
                rec["schema_match"] = sorted(cols) == sorted(ocols)
                rec["hash_match"] = (
                    _normalize(rows, cols) == _normalize(orows, ocols))
                con.close()
            else:
                rec["rows_match"] = True  # rows-only check
        except Exception:
            rec["err"] = traceback.format_exc(limit=5)
        ok = rec["err"] is None and rec.get("rows_match") and \
            rec.get("hash_match") in (True, None)
        status = "OK " if ok else "FAIL"
        if not ok:
            failed.append(name)
        print(f"{status} {name}: rows={rec.get('spark_rows')} "
              f"hash={rec.get('hash_match')}"
              + (f" err={rec['err'].splitlines()[-1]}" if rec["err"] else ""))
        results[name] = rec

    print(f"\n{len(results) - len(failed)}/{len(results)} green")
    if failed:
        print("FAILED:", ", ".join(failed))
    with open("/tmp/vanilla_harness.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    # record green fingerprints for the stale tripwire (--stale)
    recorded = _load_green_hashes()
    for name, rec in results.items():
        if name not in failed and rec["err"] is None:
            recorded[name] = _fingerprint(queries[name], oracles.get(name))
    with open(HASH_FILE, "w") as f:
        json.dump(recorded, f, indent=1, sort_keys=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
