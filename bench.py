#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": ..., "unit": "sec", "queries": {...},
"sf": ...}.

Each query executes to completion through the noop sink (full pipeline,
no driver collect cost). Best of two runs per query to damp JVM warmup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


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

    # warmup: spin the JVM + parquet reader once
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in sorted(queries):
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
    spark.stop()


if __name__ == "__main__":
    main()
