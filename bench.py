#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": ..., "unit": "sec", "queries": {...},
"sf": ...}.

Each query executes to completion through the noop sink (full pipeline,
no driver collect cost). Best of two runs per query to damp JVM warmup.

Env knobs:
  SPARK_GRAFT_BENCH_RUNS=N  runs per query (default 2, best-of-N)
  SPARK_GRAFT_BENCH_ONLY=a,b  run only the named queries
  SPARK_GRAFT_BENCH_COLD=1  cold mode: 1 run per query and operator
                            caches + the Spark cache are cleared between
                            queries, so the dominant costs (md5/shingle
                            hashing behind the cached MinHash signatures)
                            are paid inside the measured window instead
                            of hiding behind a warm best-of-2
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COLD = os.environ.get("SPARK_GRAFT_BENCH_COLD", "") == "1"
RUNS = 1 if COLD else int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    from datafusion_async_parquet_index_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # warmup: spin the JVM + parquet reader once, and the Python worker
    # pool (one worker per core — their fork/import cost otherwise lands
    # entirely inside the first mapInPandas query's measured window)
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    (spark.range(256).repartition(
        spark.sparkContext.defaultParallelism)
     .mapInPandas(lambda it: it, "id long").count())

    from datafusion_async_parquet_index_spark.operators.util import clear_caches

    only = {n for n in os.environ.get(
        "SPARK_GRAFT_BENCH_ONLY", "").split(",") if n}
    if only:
        queries = {k: v for k, v in queries.items() if k in only}

    timings: dict[str, float] = {}
    for name in sorted(queries):
        if COLD:
            clear_caches()
            spark.catalog.clearCache()
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
    }))
    # The driver records only the TAIL of stdout, and with 100+ queries
    # the full alphabetical dict gets cut mid-key (BENCH_r03 "parsed":
    # null). Emit a compact line LAST — suite total, query count, and
    # the slowest entries — so the headline numbers always survive the
    # tail window regardless of suite size.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "cold": COLD,
        "sf": _sf_from_dir(SF_DIR),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
