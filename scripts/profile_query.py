#!/usr/bin/env python3
"""Per-query profiling harness for the optimization rounds.

Times named queries exactly like bench.py (noop sink, warm best-of-N
after a JVM/worker warmup) and captures .explain("formatted") output to
plans/<round>/<name>_<tag>.txt so plan claims are checkable offline.

Usage:
  python scripts/profile_query.py --tag before --round r14 q91_delete_scan sim_hybrid_rrf
  python scripts/profile_query.py --runs 3 --no-plan dedup_semantic
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default=None,
                    help="write plans/<round>/<name>_<tag>.txt")
    ap.add_argument("--round", default="r14")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cold", action="store_true",
                    help="clear operator caches before every run")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from datafusion_async_parquet_index_spark.session import get_spark
    from datafusion_async_parquet_index_spark.operators.util import (
        clear_caches)

    spark = get_spark("profile", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    (spark.range(256).repartition(spark.sparkContext.defaultParallelism)
     .mapInPandas(lambda it: it, "id long").count())

    queries = entry_mod.queries()
    out: dict[str, list[float]] = {}
    for name in args.names:
        fn = queries[name]
        samples = []
        for _ in range(args.runs):
            if args.cold:
                clear_caches()
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            samples.append(round(time.perf_counter() - t0, 4))
        out[name] = samples
        if args.tag:
            plan_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", args.round)
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(
                    plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(f"# {name} @ {SF_DIR} runs={samples}\n")
                fh.write(buf.getvalue())
        print(json.dumps({name: samples}), flush=True)
    print(json.dumps({"best": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
