"""Regression tests for the round-10 ADVICE findings:

1. dedup_overlap_kmv on a degenerate corpus (both document sets empty)
   must emit the same zero row the DuckDB oracle produces instead of
   crashing with IndexError on ``u[-1]``.
2. The KMV intersection estimate uses the union sketch's ACTUAL fill
   as the Jaccard denominator: below fill (cu < K) both sets are held
   exactly, so inter_est == inter_exact — the old ci/K formula
   underestimated by cu/K. The oracle mirrors the same formula, so
   both engines stay IEEE-identical.
3. DataFrameIndexCatalog.expire_snapshots tombstones expired ids:
   a later as-of read reports "has been expired" (sqlite-backend
   parity), not "unknown snapshot id".
"""

import os
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.operators.dedup import (
    KMV_K,
    _overlap_kmv_sql,
    dedup_overlap_kmv,
)

from fixture_io import one_file as _one_file


def _docs_corpus(spark, rows_df):
    d = tempfile.mkdtemp(prefix="kmv_advice_")
    rows_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    return d


def _oracle_row(d):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'documents.parquet', '*.parquet')}')")
    res = con.execute(_overlap_kmv_sql())
    cols = [c[0] for c in res.description]
    return dict(zip(cols, res.fetchone()))


def test_kmv_empty_union_matches_oracle(spark):
    """No doc_id is even or divisible by 3 -> both sets empty; the
    Spark side must return the zero row, not IndexError, and the
    DuckDB oracle must agree value-for-value."""
    rows = spark.range(500).select(
        (F.col("id") * 6 + 1).alias("doc_id"),
        F.concat(F.lit("t "), F.col("id").cast("string")).alias("text"))
    d = _docs_corpus(spark, rows)
    r = dedup_overlap_kmv(spark, d).head()
    o = _oracle_row(d)
    assert (r["n_a"], r["n_b"], r["inter_exact"]) == (0, 0, 0)
    assert r["union_est"] == 0.0 and r["inter_est"] == 0.0
    for k in ("n_a", "n_b", "union_est", "inter_est", "inter_exact"):
        assert r[k] == o[k], f"{k}: spark {r[k]} != oracle {o[k]}"


def test_kmv_below_fill_is_exact_and_matches_oracle(spark):
    """Union of distinct hashes < K: the sketches hold both sets in
    full, so union_est == |A∪B| and inter_est == inter_exact exactly
    (the r10 ADVICE bias fix); oracle agrees bit-for-bit."""
    # doc_ids 0..59: A = evens (30 texts), B = %3 (20 texts),
    # shared = %6 (10 texts) -> |A∪B| = 40 < K = 64
    rows = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"))
    d = _docs_corpus(spark, rows)
    r = dedup_overlap_kmv(spark, d).head()
    assert r["n_a"] == 30 and r["n_b"] == 20 and r["inter_exact"] == 10
    assert 40 < KMV_K
    assert r["union_est"] == 40.0
    assert r["inter_est"] == float(r["inter_exact"])  # the bias fix
    o = _oracle_row(d)
    for k in ("n_a", "n_b", "union_est", "inter_est", "inter_exact"):
        assert r[k] == o[k], f"{k}: spark {r[k]} != oracle {o[k]}"


def test_df_catalog_expired_snapshot_tombstone(spark):
    """Expired ids must raise 'has been expired' from snapshot_files /
    snapshot_manifest (sqlite parity); never-created ids keep raising
    'unknown snapshot id'."""
    from datafusion_async_parquet_index_spark.sources.df_catalog import (
        DataFrameIndexCatalog,
    )
    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )

    d = tempfile.mkdtemp(prefix="df_expire_")
    base = spark.range(100).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 10).cast("long").alias("v"))
    _one_file(base, d, "a.parquet")
    tbl = IndexedParquetTable(spark, d, ["k", "v"],
                              catalog=DataFrameIndexCatalog(spark))
    cat = tbl.catalog
    s1 = cat.create_snapshot()
    s2 = cat.create_snapshot()
    expired = cat.expire_snapshots(keep_last=1)
    assert expired == [s1]
    for meth in (cat.snapshot_files, cat.snapshot_manifest):
        with pytest.raises(KeyError, match="has been expired"):
            meth(s1)
        with pytest.raises(KeyError, match="unknown snapshot id"):
            meth(s2 + 999)
    # the surviving snapshot still serves
    assert set(cat.snapshot_files(s2)) == {"a.parquet"}
