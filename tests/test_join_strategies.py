"""Join-strategy helpers: salted join must be result-identical to the
plain join; bucketed tables must join without a shuffle exchange.
"""

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.operators.joins import (
    bucketed_join, salted_join, write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    # skewed left: one hot key with many rows
    left = spark.createDataFrame(
        [(1, f"hot{i}") for i in range(500)] + [(2, "a"), (3, "b")],
        ["k", "lv"])
    right = spark.createDataFrame(
        [(1, "r1"), (1, "r2"), (2, "r3"), (4, "r4")], ["k", "rv"])
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k").collect()))
    assert salted == plain
    assert len(plain) == 500 * 2 + 1


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    (orders.write.mode("overwrite")
     .option("path", str(tmp_path / "orders_b"))
     .bucketBy(8, "o_custkey").sortBy("o_custkey")
     .saveAsTable("orders_b"))
    (customer.withColumnRenamed("c_custkey", "o_custkey")
     .write.mode("overwrite")
     .option("path", str(tmp_path / "customer_b"))
     .bucketBy(8, "o_custkey").sortBy("o_custkey")
     .saveAsTable("customer_b"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "orders_b", "customer_b",
                               on=["o_custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        # sanity: result matches a plain join
        expected = orders.join(
            customer, orders.o_custkey == customer.c_custkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_write_bucketed_helper(spark, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    write_bucketed(df, "nation_b", ["n_nationkey"], num_buckets=4,
                   path=str(tmp_path / "nation_b"))
    try:
        assert spark.table("nation_b").count() == df.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_b")


def test_join_planned_strategy_and_result(spark, sf_dir, tmp_path):
    """Catalog-cost-based join planning: a selective predicate whose
    surviving row groups bound few rows must broadcast the pruned side
    (with auto-broadcast off, only our decision can produce the
    BroadcastHashJoin); an unselective one must not — and both produce
    exactly the plain join's rows."""
    from datafusion_async_parquet_index_spark.plans.expr import col
    from datafusion_async_parquet_index_spark.sources.layout import (
        write_range_sorted,
    )
    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey")
    d = str(tmp_path / "orders_sorted")
    write_range_sorted(orders, d, ["o_orderkey"], num_files=4,
                       row_group_bytes=1 << 15)
    t = IndexedParquetTable(spark, d, index_columns=["o_orderkey"])
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity")
    total = sum(f[3] for f in t.catalog.all_files())
    hi = orders.agg(F.max("o_orderkey")).head()[0]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = t.join_planned(col("o_orderkey") > hi - 5, li,
                           "o_orderkey", "l_orderkey",
                           broadcast_max_rows=(total * 4) // 5)
        assert t.last_join_plan["strategy"] == "broadcast"
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        expected = sorted(map(tuple, (
            orders.filter(F.col("o_orderkey") > hi - 5)
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .collect())))
        assert sorted(map(tuple, j.collect())) == expected
        j2 = t.join_planned(col("o_orderkey") >= 0, li,
                            "o_orderkey", "l_orderkey",
                            broadcast_max_rows=(total * 4) // 5)
        assert t.last_join_plan["strategy"] == "shuffle"
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan2
        assert j2.count() == li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
