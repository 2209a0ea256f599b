"""Decimal-category index support (round 4): DECIMAL(p,s) columns index
as ulp-widened DOUBLE bounds — an extension past the reference's
supported set (index.rs:396-415 has no decimal arm), closing the
"extensible later to Decimal" line of SURVEY §1.

Soundness contract under test: float conversion is correctly-rounded
(monotone) and the stored bounds are widened one ulp outward, so a
stats comparison can keep spuriously but never refute spuriously; the
catalog-only min_max answer treats the category as never-exact and
falls back to a scan that returns true Decimals.
"""

import decimal
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)

D = decimal.Decimal


@pytest.fixture(scope="module")
def dec_dir(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("dec_corpus"))
    # 4 row groups of 5 rows with known price ranges + one NULL
    prices = [D("1.00"), D("2.50"), D("3.75"), D("4.99"), D("5.00"),
              D("100.00"), D("150.25"), D("175.50"), D("199.99"), D("200.00"),
              D("1000.01"), None, D("1250.00"), D("1499.99"), D("1500.00"),
              D("42.42"), D("42.42"), D("42.42"), D("42.42"), D("42.42")]
    t = pa.table({
        "id": pa.array(range(20), pa.int64()),
        "price": pa.array(prices, pa.decimal128(10, 2)),
    })
    pq.write_table(t, os.path.join(d, "part-0.parquet"), row_group_size=5)
    return d


def test_decimal_category_detected(dec_dir, spark):
    t = IndexedParquetTable(spark, dec_dir, index_columns=["price"])
    assert t.index_schema == {"price": "decimal"}


def test_decimal_pruning_refutes_disjoint_ranges(dec_dir, spark):
    t = IndexedParquetTable(spark, dec_dir, index_columns=["price"])
    # only row group 2 reaches past 1000
    df = t.query(col("price") > D("500.00"))
    assert sorted(r["id"] for r in df.collect()) == [10, 12, 13, 14]
    assert t.last_scan.row_groups_scanned == 1, t.last_scan.describe()
    # impossible range: refuted entirely from the catalog
    assert t.count_rows(col("price") > D("99999.99")) == 0
    assert t.last_scan.files_scanned == {}


def test_decimal_boundary_predicates_stay_sound(dec_dir, spark):
    """Equality and strict comparisons AT the stored stat boundaries:
    the ulp widening must keep the matching row groups."""
    t = IndexedParquetTable(spark, dec_dir, index_columns=["price"])
    full = spark.read.parquet(dec_dir)
    for pred in (col("price") == D("5.00"),
                 col("price") < D("1.00") + D("0.01"),
                 col("price") >= D("1500.00"),
                 col("price") == D("42.42"),
                 col("price") != D("42.42")):
        got = sorted(r["id"] for r in t.query(pred).collect())
        want = sorted(r["id"] for r in
                      full.filter(pred.to_spark()).collect())
        assert got == want, (pred.to_sql(), got, want)


def test_decimal_minmax_answers_from_catalog(dec_dir, spark):
    """Round 5: the catalog keeps EXACT decimal bounds (str(Decimal)
    side columns decoded from unscaled-int footer storage) next to the
    widened pruning doubles, so MIN/MAX answers fold with zero Parquet
    I/O and describe reports the bounds as trusted."""
    t = IndexedParquetTable(spark, dec_dir, index_columns=["price"])
    mn, mx = t.min_max("price")
    assert (mn, mx) == (D("1.00"), D("1500.00"))
    assert isinstance(mn, decimal.Decimal)
    pd = t.last_minmax_pushdown
    assert pd is not None and pd["partial_row_groups"] == 0, pd
    info = t.describe_index()
    assert info["columns"]["price"]["bounds_exact"] is True


def test_decimal_minmax_backend_equivalence(dec_dir, spark):
    """Both catalog backends must surface the same exact Decimal
    bounds (SQLite stores str(Decimal) TEXT side columns; the
    DataFrame backend keeps the Decimals in exact_bounds)."""
    from datafusion_async_parquet_index_spark.sources.df_catalog import (
        DataFrameIndexCatalog,
    )

    t_sql = IndexedParquetTable(spark, dec_dir, index_columns=["price"])
    t_df = IndexedParquetTable(spark, dec_dir, index_columns=["price"],
                               catalog=DataFrameIndexCatalog(spark))
    assert t_sql.min_max("price") == t_df.min_max("price")
    assert t_sql.last_minmax_pushdown == t_df.last_minmax_pushdown
    assert t_df.last_minmax_pushdown["partial_row_groups"] == 0


def test_decimal_sum_pushdown(dec_dir, spark):
    """Round 5: sum_columns accepts decimal columns — sums ride the
    catalog as UNSCALED ints and rescale to exact Decimal on readout;
    the no-predicate total is pure catalog arithmetic and a refutable
    range sums boundary-free groups unread."""
    t = IndexedParquetTable(spark, dec_dir, index_columns=["price"],
                            sum_columns=["price"])
    s, n = t.sum_rows("price")
    expect = sum(p for p in [
        D("1.00"), D("2.50"), D("3.75"), D("4.99"), D("5.00"),
        D("100.00"), D("150.25"), D("175.50"), D("199.99"), D("200.00"),
        D("1000.01"), D("1250.00"), D("1499.99"), D("1500.00"),
        D("42.42"), D("42.42"), D("42.42"), D("42.42"), D("42.42")])
    assert (s, n) == (expect, 19)
    assert isinstance(s, decimal.Decimal)
    assert t.last_sum_pushdown["partial_row_groups"] == 0

    # predicated: the rg-0 interval [1.00, 5.00] satisfies < 50 fully…
    s2, n2 = t.sum_rows("price", col("price") < D("50"))
    assert (s2, n2) == (D("1.00") + D("2.50") + D("3.75") + D("4.99")
                        + D("5.00") + 5 * D("42.42"), 10)
    # …but decimal satisfaction never fires (widened bounds), so the
    # answer comes from candidate-group scans — correctness over speed
    assert t.last_sum_pushdown["full_row_groups"] == 0

    # an INT predicate with a decimal MEASURE gets full pushdown: the
    # satisfaction proof runs on the int column, the stored unscaled
    # sums answer the proven groups unread
    t2 = IndexedParquetTable(spark, dec_dir, index_columns=["id", "price"],
                             sum_columns=["price"])
    s3, n3 = t2.sum_rows("price", col("id") <= 9)
    assert (s3, n3) == (D("1.00") + D("2.50") + D("3.75") + D("4.99")
                        + D("5.00") + D("100.00") + D("150.25")
                        + D("175.50") + D("199.99") + D("200.00"), 10)
    assert t2.last_sum_pushdown["full_row_groups"] == 2
    assert t2.last_sum_pushdown["partial_row_groups"] == 0


def test_decimal_int_literal_predicates(dec_dir, spark):
    """Plain int/float literals against a decimal column prune too."""
    t = IndexedParquetTable(spark, dec_dir, index_columns=["price"])
    df = t.query(col("price") > 500)
    assert df.count() == 4
    assert t.last_scan.row_groups_scanned == 1


def test_spark_written_decimal_prunes_via_raw_stats(spark, tmp_path):
    """Spark writes precision<=18 decimals with int32/int64 physical
    types whose footer stats pyarrow 16 cannot decode (st.min raises);
    extraction must fall back to min_raw/max_raw + the arrow scale and
    still refute out-of-range row groups."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "spark_dec")
    (spark.range(100)
     .select(F.col("id"),
             ((F.col("id") * 100 + 50) / 100).cast("decimal(12,2)")
             .alias("ep"))
     .repartition(4, F.floor(F.col("id") / 25))
     .write.mode("overwrite").parquet(d))
    t = IndexedParquetTable(spark, d, index_columns=["ep"])
    assert t.index_schema == {"ep": "decimal"}
    total_rgs = sum(f[2] for f in t.catalog.all_files())
    df = t.query(col("ep") > D("90.00"))
    assert df.count() == 10  # ids 90..99 -> 90.50 .. 99.50, all > 90.00
    assert t.last_scan.row_groups_scanned < total_rgs, \
        t.last_scan.describe()


def test_decimal_backends_agree(dec_dir, spark):
    """SQLite and DataFrame catalog backends must return identical
    pruning decisions for decimal predicates (Decimal literal vs REAL
    storage in SQLite; Decimal literal vs DoubleType column in Spark —
    both monotone against the widened bounds)."""
    from datafusion_async_parquet_index_spark.sources.df_catalog import (
        DataFrameIndexCatalog,
    )

    t1 = IndexedParquetTable(spark, dec_dir, index_columns=["price"])
    t2 = IndexedParquetTable(spark, dec_dir, index_columns=["price"],
                             catalog=DataFrameIndexCatalog(spark))
    for pred in (col("price") > D("500.00"),
                 col("price") == D("42.42"),
                 (col("price") >= D("100.00")) & (col("price") <= D("200.00")),
                 col("price").is_null()):
        d1 = t1.plan_scan(pred).files_scanned
        d2 = t2.plan_scan(pred).files_scanned
        assert d1 == d2, (pred.to_sql(), d1, d2)
