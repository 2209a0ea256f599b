"""Feed-fold ≡ recompute parity for q99 (VERDICT r8 ask #7): the gate
row now returns the fold alone (the DuckDB oracle is the recompute),
and the Spark-side row-for-row parity lives here instead of executing
a permanent second aggregate inside the gate."""

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.queries import (
    q99_incremental_agg_from_feed,
)


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_join_view_fold_equals_live_recompute(spark, sf_dir):
    """q102: the delta rule Δ(R ⋈ D) = ΔR ⋈ D — the fold of the signed
    change rows joined to the dim must equal the live join recomputed
    from the table, row for row."""
    from datafusion_async_parquet_index_spark.operators.util import (
        read_table,
        session_memo,
    )
    from datafusion_async_parquet_index_spark.queries import (
        q102_incremental_join_view_from_feed,
    )

    incr = q102_incremental_join_view_from_feed(spark, sf_dir)
    t, _base = session_memo(spark, "dv_feed_join_view")[sf_dir]
    dim = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").cast("long").alias("nationkey"))
    direct = (t.query(None).join(F.broadcast(dim), "o_custkey")
              .groupBy("nationkey")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("cents").cast("long").alias("sum_cents"))
              .orderBy("nationkey"))
    got = [(r["nationkey"], r["n"], r["sum_cents"])
           for r in incr.collect()]
    want = [(r["nationkey"], r["n"], r["sum_cents"])
            for r in direct.collect()]
    assert got == want, (got, want)


def test_feed_fold_equals_live_recompute(spark, sf_dir):
    from datafusion_async_parquet_index_spark.queries import _dv_fixture

    incr = q99_incremental_agg_from_feed(spark, sf_dir)
    t, _base = _dv_fixture(spark, sf_dir, "dv_table_feed_agg")
    bucket = (F.col("cents") % 5).cast("long").alias("bucket")
    direct = (t.query(None).select(bucket, "cents")
              .groupBy("bucket")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("cents").cast("long").alias("sum_cents"))
              .orderBy("bucket"))
    got = [(r["bucket"], r["n"], r["sum_cents"])
           for r in incr.collect()]
    want = [(r["bucket"], r["n"], r["sum_cents"])
            for r in direct.collect()]
    assert got == want, (got, want)
