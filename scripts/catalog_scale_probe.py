#!/usr/bin/env python
"""Catalog scaling probe: how does PLANNING latency behave when the
index holds a 100 TB-shaped file population?

At 100 TB with ~512 MB files a table has ~200k files; with 8 row
groups each that is ~1.6M row-group stats rows. Planning cost is the
index's whole value proposition — it must stay milliseconds while the
data it replaces scanning grows unbounded. This probe builds synthetic
catalogs (no parquet involved: planning touches only the catalog) at
increasing file counts and times plan-shaped lookups on the SQLite
backend: point equality, a 1% range, a contradiction, and an IN-list,
plus the upsert throughput that bounds index-build time.

Usage: python scripts/catalog_scale_probe.py [max_files]
Prints one JSON line per scale tier.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_async_parquet_index_spark.plans.expr import Col, InList, Lit
from datafusion_async_parquet_index_spark.plans.pruning import PruningRewriter
from datafusion_async_parquet_index_spark.sources.catalog import (
    FileStats, RowGroupStats, SqliteIndexCatalog,
)

RGS_PER_FILE = 8
ROWS_PER_RG = 100_000


def build(n_files: int, rtree: bool = False) -> tuple:
    cat = SqliteIndexCatalog(rtree_columns=("v",) if rtree else ())
    cat.initialize({"v": "int"})
    t0 = time.perf_counter()
    for f in range(n_files):
        # sorted layout: file f covers [f*8e5, (f+1)*8e5)
        base = f * RGS_PER_FILE * ROWS_PER_RG
        rgs = []
        for rg in range(RGS_PER_FILE):
            lo = base + rg * ROWS_PER_RG
            rgs.append(RowGroupStats(
                row_group=rg, row_count=ROWS_PER_RG,
                columns={"v": (0, lo, lo + ROWS_PER_RG - 1)}))
        cat.upsert_file(
            FileStats(f"f{f:07d}.parquet", 512 << 20, RGS_PER_FILE,
                      RGS_PER_FILE * ROWS_PER_RG), rgs)
    return cat, time.perf_counter() - t0


def probe(n_files: int, rtree: bool = False) -> dict:
    cat, build_s = build(n_files, rtree=rtree)
    rw = PruningRewriter({"v": "int"})
    domain = n_files * RGS_PER_FILE * ROWS_PER_RG

    def t_plan(pred, windows, reps=20):
        sp = rw.rewrite(pred)
        best = float("inf")
        out_len = 0
        for _ in range(reps):
            a = time.perf_counter()
            res = (cat.get_files(sp, prefilter=("v", windows))
                   if rtree else cat.get_files(sp))
            best = min(best, time.perf_counter() - a)
            out_len = sum(len(r) for _, r in res)
        return round(best * 1000, 3), out_len

    point_ms, point_rgs = t_plan(Col("v") == Lit(domain // 2),
                                 [(domain // 2, domain // 2)])
    lo = domain // 2
    rng_ms, rng_rgs = t_plan(
        (Col("v") >= Lit(lo)) & (Col("v") <= Lit(lo + domain // 100)),
        [(lo, lo + domain // 100)])
    contra_ms, contra_rgs = t_plan(
        (Col("v") > Lit(domain)) & (Col("v") < Lit(0)), [(domain, 0)])
    in_lits = [i * domain // 10 + 7 for i in range(10)]
    in_ms, in_rgs = t_plan(InList(Col("v"), [Lit(x) for x in in_lits]),
                           [(x, x) for x in in_lits])
    return {
        "files": n_files, "rg_rows": n_files * RGS_PER_FILE,
        "rtree": rtree, "build_s": round(build_s, 2),
        "upserts_per_s": round(n_files / build_s),
        "point_ms": point_ms, "point_rgs": point_rgs,
        "range1pct_ms": rng_ms, "range1pct_rgs": rng_rgs,
        "contradiction_ms": contra_ms, "contradiction_rgs": contra_rgs,
        "in10_ms": in_ms, "in10_rgs": in_rgs,
    }


if __name__ == "__main__":
    max_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n = 2_000
    while n <= max_files:
        print(json.dumps(probe(n)))
        print(json.dumps(probe(n, rtree=True)))
        n *= 10
