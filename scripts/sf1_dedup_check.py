#!/usr/bin/env python
"""Spark-side structural verification of the dedup family at the 10x
corpus — used where the DuckDB oracle twin is infeasible at that scale
(pair-materializing SQL is quadratic in the exact-duplicate cliques the
10x replication creates; the Spark side is banded/bucketed and isn't).

Checks, all provable from the corpus construction alone:
  - dedup_exact: every fingerprint group has size ~ replicas (each
    sf0.1 doc was replicated verbatim), total rows preserved;
  - dedup_cluster_stats: cluster sizes cover every doc exactly once,
    and NO cluster is smaller than the replica count (exact copies
    share all bands, so replicas can never be split);
  - dedup_minhash_lsh: candidate pairs are a superset of the
    within-clique pairs for a sample of doc groups.

Usage: python scripts/sf1_dedup_check.py [sf1_dir] [replicas]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def main() -> int:
    from pyspark.sql import functions as F

    from datafusion_async_parquet_index_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("sf1-dedup-check")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    n_docs = spark.read.parquet(
        os.path.join(SF1, "documents.parquet")).count()

    t0 = time.perf_counter()
    exact = qs["dedup_exact"](spark, SF1)
    row = exact.agg(F.sum("dup_cnt").alias("total"),
                    F.min("dup_cnt").alias("mn")).head()
    assert row["total"] == n_docs, (row, n_docs)
    assert row["mn"] >= R, f"a content-hash group split below R: {row}"
    print(f"OK dedup_exact: {n_docs} docs, every content-hash group >= {R} "
          f"({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    stats = qs["dedup_cluster_stats"](spark, SF1).collect()
    covered = sum(r["cluster_size"] * r["n_clusters"] for r in stats)
    assert covered == n_docs, (covered, n_docs)
    # every doc WITH a MinHash signature shares all bands with its R-1
    # exact copies, so real clusters can never hold fewer than R docs;
    # only shingle-less (too-short) docs may stay singletons
    bad = [r for r in stats if 1 < r["cluster_size"] < R]
    assert not bad, f"clusters split below the replica count: {bad}"
    singles = sum(r["n_clusters"] for r in stats if r["cluster_size"] == 1)
    print(f"OK dedup_cluster_stats: {covered} docs covered, every real "
          f"cluster >= {R}, {singles} shingle-less singletons "
          f"({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    pairs = qs["dedup_minhash_lsh"](spark, SF1)
    # replicas of one source doc differ by exactly the key offset;
    # their texts are identical, so every within-clique pair must be an
    # LSH candidate. Spot-check the 20 lowest source ids.
    base = [r["doc_id"] for r in
            spark.read.parquet(os.path.join(SF1, "documents.parquet"))
            .orderBy("doc_id").limit(20).collect()]
    off = 10 ** len(str(int(
        spark.read.parquet(os.path.join(SF1, "documents.parquet"))
        .agg(F.max("doc_id")).head()[0] // 10)))
    got = {(r["doc_a"], r["doc_b"]) for r in
           pairs.filter(F.col("doc_a").isin(
               [b + i * off for b in base for i in range(R)])).collect()}
    missing = 0
    for b in base:
        ids = sorted(b + i * off for i in range(R))
        for i, a in enumerate(ids):
            for c in ids[i + 1:]:
                if (a, c) not in got and (c, a) not in got:
                    missing += 1
    assert missing == 0, f"{missing} within-clique pairs not candidates"
    print(f"OK dedup_minhash_lsh: all within-clique pairs of 20 sampled "
          f"groups are candidates ({time.perf_counter() - t0:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
