"""Hive-partitioned layouts through the external index.

Partition values enter the catalog as degenerate min = max statistics
per file, so the SAME refutation-sound rewrite that prunes on footer
stats prunes on partition directories — no partition-specific predicate
logic exists anywhere.  These tests pin:

- partition-equality pruning to exactly the matching directory's files,
- mixed partition AND data-column predicates narrowing through both,
- result parity with a plain Spark read of the same layout,
- basename collisions across partition dirs (catalog keys by relative
  path),
- refresh() picking up a new partition directory,
- auto-detection of the layout, and the rowgroups-mode guard.
"""

import os

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.table import IndexedParquetTable


@pytest.fixture(scope="module")
def part_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("orders_part"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (orders.repartition(2)
     .write.partitionBy("o_orderstatus").mode("overwrite").parquet(d))
    return d


@pytest.fixture(scope="module")
def part_table(spark, part_dir):
    return IndexedParquetTable(
        spark, part_dir, index_columns=["o_totalprice"], partitioned=True)


def test_autodetect_partitioned(spark, part_dir):
    t = IndexedParquetTable(spark, part_dir, index_columns=["o_totalprice"])
    assert t.partitioned is True
    assert "o_orderstatus" in t.index_schema


def test_partition_schema_enters_index(part_table):
    assert part_table.index_schema["o_orderstatus"] == "string"
    assert part_table.index_schema["o_totalprice"] == "float"
    # catalog keyed by dir-relative names (basenames collide across dirs)
    names = [f[0] for f in part_table.catalog.all_files()]
    assert all("=" in n and os.sep in n for n in names)
    basenames = [os.path.basename(n) for n in names]
    assert len(set(basenames)) < len(basenames), (
        "fixture should produce colliding basenames across partitions")


def test_partition_equality_prunes_to_one_dir(part_table):
    df = part_table.query(col("o_orderstatus") == "F")
    decision = part_table.last_scan
    assert decision.files_scanned, "F partition must exist"
    assert all(f.startswith("o_orderstatus=F") for f in decision.file_names)
    assert 0 < len(decision.files_scanned) < decision.total_files
    # every returned row really is from the partition (residual filter)
    assert df.filter(F.col("o_orderstatus") != "F").count() == 0
    assert df.count() > 0


def test_partition_parity_with_plain_read(spark, part_table, part_dir):
    ours = part_table.query(col("o_orderstatus") == "P").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("s")).head()
    plain = (spark.read.parquet(part_dir)
             .filter(F.col("o_orderstatus") == "P")
             .agg(F.count(F.lit(1)).alias("cnt"),
                  F.round(F.sum("o_totalprice"), 2).alias("s")).head())
    assert ours == plain


def test_mixed_partition_and_stats_predicate(spark, part_table, part_dir):
    pred = (col("o_orderstatus") == "O") & (col("o_totalprice") > 300000.0)
    df = part_table.query(pred)
    decision = part_table.last_scan
    assert all(f.startswith("o_orderstatus=O") for f in decision.file_names)
    expect = (spark.read.parquet(part_dir)
              .filter((F.col("o_orderstatus") == "O")
                      & (F.col("o_totalprice") > 300000.0)).count())
    assert df.count() == expect


def test_nonexistent_partition_zero_io(part_table):
    df = part_table.query(col("o_orderstatus") == "ZZZ")
    assert df.count() == 0
    assert part_table.last_scan.files_scanned == {}


def test_partition_in_list(part_table):
    df = part_table.query(col("o_orderstatus").isin("F", "ZZZ"))
    assert all(f.startswith("o_orderstatus=F")
               for f in part_table.last_scan.file_names)
    assert df.count() > 0


def test_unpartitioned_columns_still_prune(part_table):
    # contradiction on the indexed data column: refuted from footer
    # stats (float col-literal refutation mirrors the zone-map
    # semantics Spark's own parquet reader applies — see
    # tests/test_nan_soundness.py for the NaN contract)
    df = part_table.query((col("o_totalprice") > 9e9))
    assert df.count() == 0
    assert part_table.last_scan.files_scanned == {}


def test_refresh_picks_up_new_partition(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("orders_grow"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (orders.filter(F.col("o_orderstatus") == "F")
     .write.partitionBy("o_orderstatus").mode("overwrite").parquet(d))
    t = IndexedParquetTable(
        spark, d, index_columns=["o_totalprice"], partitioned=True)
    assert t.query(col("o_orderstatus") == "O").count() == 0
    # a new partition directory arrives
    (orders.filter(F.col("o_orderstatus") == "O")
     .write.partitionBy("o_orderstatus").mode("append").parquet(d))
    t.refresh()
    got = t.query(col("o_orderstatus") == "O").count()
    expect = orders.filter(F.col("o_orderstatus") == "O").count()
    assert got == expect
    assert all(f.startswith("o_orderstatus=O")
               for f in t.last_scan.file_names)


def test_int_partition_values_prune_typed(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("li_bucketed"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    (li.withColumn("qbucket", (F.col("l_quantity") / 10).cast("int"))
     .write.partitionBy("qbucket").mode("overwrite").parquet(d))
    t = IndexedParquetTable(
        spark, d, index_columns=["l_extendedprice"], partitioned=True)
    assert t.index_schema["qbucket"] == "int"
    df = t.query((col("qbucket") >= 2) & (col("qbucket") < 4))
    assert all(f.startswith(("qbucket=2", "qbucket=3"))
               for f in t.last_scan.file_names)
    expect = li.filter((F.col("l_quantity") >= 20)
                       & (F.col("l_quantity") < 40)).count()
    assert df.count() == expect


def test_rowgroups_mode_rejected(part_table):
    with pytest.raises(ValueError, match="rowgroups"):
        part_table.query(col("o_orderstatus") == "F", mode="rowgroups")


def test_backends_agree_on_partitioned_decisions(spark, part_dir):
    """The DataFrame/lakehouse catalog backend receives the same
    degenerate partition stats through the same upsert path, so both
    backends must return the identical pruning decision for partition
    and mixed predicates."""
    from datafusion_async_parquet_index_spark.sources.df_catalog import (
        DataFrameIndexCatalog,
    )

    sq = IndexedParquetTable(
        spark, part_dir, index_columns=["o_totalprice"], partitioned=True)
    df_t = IndexedParquetTable(
        spark, part_dir, index_columns=["o_totalprice"], partitioned=True,
        catalog=DataFrameIndexCatalog(spark))
    for pred in [
        col("o_orderstatus") == "F",
        (col("o_orderstatus") == "O") & (col("o_totalprice") > 300000.0),
        col("o_orderstatus").isin("P", "ZZZ"),
        col("o_orderstatus") == "ZZZ",
    ]:
        a = sq.plan_scan(pred).files_scanned
        b = df_t.plan_scan(pred).files_scanned
        assert {k: sorted(v) for k, v in a.items()} == \
            {k: sorted(v) for k, v in b.items()}, pred.to_sql()


def test_hive_null_partition_sentinel(spark, tmp_path_factory):
    """Rows with a NULL partition value land under the
    __HIVE_DEFAULT_PARTITION__ directory; their injected stats are
    all-null (null_count = row_count), so IS NULL prunes to exactly
    that directory and IS NOT NULL excludes it — the null_count term
    of the rewriter working on the partition dimension."""
    from pyspark.sql import types as T

    d = str(tmp_path_factory.mktemp("null_part"))
    schema = T.StructType([
        T.StructField("v", T.IntegerType()),
        T.StructField("grp", T.StringType()),
    ])
    rows = [(i, None if i % 4 == 0 else f"g{i % 2}") for i in range(40)]
    (spark.createDataFrame(rows, schema)
     .write.partitionBy("grp").mode("overwrite").parquet(d))
    t = IndexedParquetTable(spark, d, index_columns=["v"], partitioned=True)
    nulls = t.query(col("grp").is_null())
    assert all("__HIVE_DEFAULT_PARTITION__" in f
               for f in t.last_scan.file_names)
    assert nulls.count() == 10
    notnull = t.query(col("grp").is_not_null())
    assert all("__HIVE_DEFAULT_PARTITION__" not in f
               for f in t.last_scan.file_names)
    assert notnull.count() == 30
    g0 = t.query(col("grp") == "g0")
    assert all(f.startswith("grp=g0") for f in t.last_scan.file_names)
    # evens that are not multiples of 4: 2, 6, ..., 38
    assert g0.count() == 10


def test_query_sql_prunes_partition_dirs(part_table):
    """The SQL WHERE entry point parses into the same Expr AST, so a
    partition predicate arriving as text prunes directories too."""
    df = part_table.query_sql(
        "o_orderstatus = 'F' AND o_totalprice > 100000")
    assert all(f.startswith("o_orderstatus=F")
               for f in part_table.last_scan.file_names)
    assert df.count() > 0


def test_refresh_drops_deleted_partition(spark, sf_dir, tmp_path_factory):
    """Deleting a partition directory and refreshing must drop its
    catalog rows: the stale partition neither appears in scans nor
    inflates catalog-only counts."""
    import shutil

    d = str(tmp_path_factory.mktemp("orders_shrink"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(d))
    t = IndexedParquetTable(
        spark, d, index_columns=["o_totalprice"], partitioned=True)
    full = t.count_rows()
    n_f = t.query(col("o_orderstatus") == "F").count()
    assert n_f > 0
    shutil.rmtree(os.path.join(d, "o_orderstatus=F"))
    t.refresh()
    assert t.query(col("o_orderstatus") == "F").count() == 0
    assert t.last_scan.files_scanned == {}
    assert t.count_rows() == full - n_f


def test_count_rows_by_catalog_only(spark, part_table, part_dir):
    """GROUP BY COUNT from the catalog alone: per-partition row counts
    match a real scan aggregate on both backends, and a non-single-
    valued column returns None (fallback contract)."""
    from datafusion_async_parquet_index_spark.sources.df_catalog import (
        DataFrameIndexCatalog,
    )

    expect = {r["o_orderstatus"]: r["cnt"] for r in
              spark.read.parquet(part_dir)
              .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cnt"))
              .collect()}
    assert part_table.count_rows_by("o_orderstatus") == expect
    df_t = IndexedParquetTable(
        spark, part_dir, index_columns=["o_totalprice"], partitioned=True,
        catalog=DataFrameIndexCatalog(spark))
    assert df_t.count_rows_by("o_orderstatus") == expect
    # data column with real ranges: not single-valued -> None
    assert part_table.count_rows_by("o_totalprice") is None
    # unindexed column -> None
    assert part_table.count_rows_by("no_such") is None


def test_min_max_by_catalog_only(spark, part_table, part_dir):
    """Grouped MIN/MAX from the catalog alone: per-partition int-column
    extremes match a real scan aggregate; float targets without
    NaN-free proof return None (trust contract); NULL-bearing targets
    count only non-nulls."""
    t = IndexedParquetTable(
        spark, part_dir, index_columns=["o_custkey"], partitioned=True)
    got = t.min_max_by("o_orderstatus", "o_custkey")
    assert got is not None
    expect = {r["o_orderstatus"]: (r["mn"], r["mx"], r["n"]) for r in
              spark.read.parquet(part_dir)
              .groupBy("o_orderstatus")
              .agg(F.min("o_custkey").alias("mn"),
                   F.max("o_custkey").alias("mx"),
                   F.count("o_custkey").alias("n")).collect()}
    assert got == expect
    # float target: footer bounds are NaN-blind, not trusted -> None
    assert part_table.min_max_by("o_orderstatus", "o_totalprice") is None
    # non-single-valued group column -> None
    assert t.min_max_by("o_custkey", "o_custkey") is None


def test_full_scan_and_count_rows(spark, part_table, part_dir):
    plain = spark.read.parquet(part_dir).count()
    assert part_table.count_rows() == plain
    assert part_table.query(None).count() == plain


def test_group_sum_pushdown_from_catalog(spark, tmp_path):
    """sum_rows_by over a partitioned layout with stored sums: grouped
    totals fold from the catalog alone and match the scan aggregate."""
    from pyspark.sql import functions as F
    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )

    d = str(tmp_path / "grp_sum")
    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 10).alias("x"))
    df.repartition(2).write.partitionBy("g").mode("overwrite").parquet(d)
    t = IndexedParquetTable(spark, d, index_columns=["x"],
                            partitioned=True, sum_columns=["x"])
    got = t.sum_rows_by("g", "x")
    assert got is not None
    want = {r["g"]: (r["s"], r["n"]) for r in
            spark.read.parquet(d).groupBy("g").agg(
                F.sum("x").alias("s"), F.count("x").alias("n")).collect()}
    assert got == want
    # a non-single-valued group column refuses (falls back to scan)
    assert t.sum_rows_by("x", "x") is None


def test_group_var_pushdown_from_catalog(spark, tmp_path):
    """sum_sq_rows_by over a partitioned layout with stored second
    moments: grouped (Σx, Σx², n) fold from the catalog alone and match
    the scan aggregate; refusal rules mirror sum_rows_by."""
    from pyspark.sql import functions as F
    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )

    d = str(tmp_path / "grp_var")
    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 10).alias("x"))
    df.repartition(2).write.partitionBy("g").mode("overwrite").parquet(d)
    t = IndexedParquetTable(spark, d, index_columns=["x"],
                            partitioned=True, sum_columns=["x"])
    got = t.sum_sq_rows_by("g", "x")
    assert got is not None
    want = {r["g"]: (r["s"], r["sq"], r["n"]) for r in
            spark.read.parquet(d).groupBy("g").agg(
                F.sum("x").alias("s"),
                F.sum(F.col("x") * F.col("x")).alias("sq"),
                F.count("x").alias("n")).collect()}
    assert got == want
    assert t.sum_sq_rows_by("x", "x") is None
    # without stored moments: refuses instead of guessing
    t2 = IndexedParquetTable(spark, d, index_columns=["x"],
                             partitioned=True)
    assert t2.sum_sq_rows_by("g", "x") is None


def test_catalog_profile_matches_scan_aggregate(spark, sf_dir):
    """q71's all-from-catalog profile (COUNT/SUM/MIN/MAX/AVG/VAR per
    status, zero Parquet I/O) must equal the scan-side aggregate."""
    from pyspark.sql import functions as F

    from datafusion_async_parquet_index_spark.queries import (
        q71_catalog_profile,
    )

    got = {r.o_orderstatus: (r.n_rows, r.sum_dollars, r.min_dollars,
                             r.max_dollars, r.avg_milli, r.var_pop_milli)
           for r in q71_catalog_profile(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderstatus",
        F.round(F.col("o_totalprice")).cast("long").alias("d"))
    want = {}
    for r in orders.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"), F.sum("d").alias("s"),
            F.min("d").alias("mn"), F.max("d").alias("mx"),
            F.sum(F.col("d") * F.col("d")).alias("sq")).collect():
        n, s, sq = int(r.n), int(r.s), int(r.sq)
        want[r.o_orderstatus] = (
            n, s, r.mn, r.mx, s * 1000 // n,
            (n * sq - s * s) * 1000 // (n * n))
    assert got == want


def test_hist_quantiles_fold_and_fallbacks(spark, tmp_path):
    """Histogram extension: the catalog fold must equal a direct
    recompute from the data, and coverage gaps (no histogram, wrong
    column) must return None, never a wrong estimate."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )

    d = str(tmp_path / "hist")
    import os
    os.makedirs(d)
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 500, 3000)
    for i in range(3):
        pq.write_table(
            pa.table({"v": pa.array(vals[i*1000:(i+1)*1000], pa.int64())}),
            os.path.join(d, f"f{i}.parquet"))
    t = IndexedParquetTable(spark, d, index_columns=["v"],
                            hist_columns={"v": (0, 499, 32)})
    res = t.hist_quantiles("v", [250, 500, 750, 990])
    assert res is not None and len(res) == 4
    # recompute the deterministic estimate directly from the values
    lo, hi, nbins = 0, 499, 32
    span = hi - lo + 1
    counts = np.bincount(
        np.clip((vals - lo) * nbins // span, 0, nbins - 1),
        minlength=nbins)
    n = int(counts.sum())
    for q, est, n_got in res:
        assert n_got == n
        target = min(max(1, (q * n + 999) // 1000), n)
        cum = 0
        for b, cnt in enumerate(counts):
            if cum + cnt >= target:
                break
            cum += cnt
        left = lo + (span * b) // nbins
        want = left + ((span // nbins) * (target - cum - 1)) // max(int(counts[b]), 1)
        assert est == want, (q, est, want)
    # estimates bracket the true quantile within one bin width
    sv = np.sort(vals)
    for q, est, _ in res:
        exact = int(sv[min(max((q * n + 999) // 1000, 1), n) - 1])
        assert abs(est - exact) <= span // nbins + 1
    # fallbacks
    assert t.hist_quantiles("nope", [500]) is None
    t2 = IndexedParquetTable(spark, d, index_columns=["v"])
    assert t2.hist_quantiles("v", [500]) is None
