"""Driver-shaped correctness harness, runnable locally.

Builds a *vanilla* SparkSession (no project confs — exactly what the
driver's correctness gate does), then runs every ``queries()`` entry and
its ``oracle_sql()`` on DuckDB at the given sf dir, comparing row count,
sorted column names, and a value hash of the column-name-sorted rows.

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if isinstance(v, float):
        v = round(v, 6)
        if v == -0.0:
            v = 0.0
    if hasattr(v, "isoformat"):
        v = v.isoformat()
    if isinstance(v, (list, tuple)):
        v = tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        v = v.hex()
    return v


def _value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = sorted(
        [tuple(_norm_cell(row[i]) for i in order) for row in rows], key=repr)
    return hashlib.md5(repr(canon).encode()).hexdigest()


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:]) if args and os.path.isdir(args[0]) else set(args)

    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle-check").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results, t_total = {}, time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name in oracles:
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                rec = {
                    "rows_match": len(srows) == len(drows),
                    "schema_match": sorted(scols) == sorted(dcols),
                    "hash_match": _value_hash(srows, scols) == _value_hash(drows, dcols),
                    "spark_rows": len(srows), "oracle_rows": len(drows),
                }
            else:
                rec = {"rows_match": len(srows) >= 0, "schema_match": None,
                       "hash_match": None, "spark_rows": len(srows),
                       "oracle_rows": None}
            rec["err"] = None
        except Exception as exc:  # mirror the driver: record, keep going
            rec = {"rows_match": None, "schema_match": None,
                   "hash_match": None, "spark_rows": None,
                   "oracle_rows": None, "err": f"{type(exc).__name__}: {exc}"[:400]}
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        ok = rec["err"] is None and rec["rows_match"] and rec["schema_match"] in (True, None) \
            and rec["hash_match"] in (True, None)
        print(f"{'PASS' if ok else 'FAIL'} {name:28s} {rec['sec']:6.2f}s "
              f"rows={rec['spark_rows']}", flush=True)
        if not ok:
            print("      ", json.dumps({k: v for k, v in rec.items() if k != 'sec'})[:500])
    print(f"total {time.time()-t_total:.1f}s")
    bad = [n for n, r in results.items()
           if r["err"] or r["rows_match"] is not True
           or r["schema_match"] is False or r["hash_match"] is False]
    print("FAILURES:", bad if bad else "none")
    spark.stop()


if __name__ == "__main__":
    main()
