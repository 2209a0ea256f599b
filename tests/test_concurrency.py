"""Optimistic concurrency on DML commits (VERDICT r10 ask #5): every
DML verb (append / delete / update / merge / optimize / restore /
expire) runs a commit-version CAS before its first mutation — a verb
that started planning at catalog version V refuses LOUDLY
(ConcurrentWriteError) if the catalog moved past V, Delta-style. This
replaces the implicit single-writer contract.

Pinned here:
- two-writer interleave on the sqlite, DataFrame, and both DB-API
  backends: the second committer refuses, the table state stays the
  first writer's, nothing is landed or half-applied, and a plain
  retry (re-planning from the new version) succeeds;
- the CAS itself across two separate connections to one catalog
  database (the true multi-process shape);
- version monotonicity: one bump per gated commit;
- catalogs without the version extension opt out (gate is a no-op).

The interleave is driven deterministically through the
``_pre_commit_hook`` test hook, invoked between a verb's planning and
its CAS.
"""

import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.catalog import (
    ConcurrentWriteError,
    DBAPIIndexCatalog,
    SqliteIndexCatalog,
)
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)

from fixture_io import one_file as _one_file


def _corpus(spark, d):
    os.makedirs(d, exist_ok=True)
    base = spark.range(1_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 100).cast("long").alias("v"))
    _one_file(base.filter(F.col("k") < 500).orderBy("k"), d, "a.parquet")
    _one_file(base.filter(F.col("k") >= 500).orderBy("k"), d, "b.parquet")


def _make_catalog(backend, spark):
    if backend == "sqlite":
        return SqliteIndexCatalog()
    if backend == "df":
        from datafusion_async_parquet_index_spark.sources.df_catalog import (
            DataFrameIndexCatalog,
        )
        return DataFrameIndexCatalog(spark)
    if backend == "dbapi":
        return DBAPIIndexCatalog(
            lambda: sqlite3.connect(":memory:", check_same_thread=False))
    raise AssertionError(backend)


BACKENDS = ["sqlite", "df", "dbapi"]


@pytest.fixture()
def two_writers(spark, tmp_path, request):
    backend = request.param
    d = str(tmp_path / f"ccr_{backend}")
    _corpus(spark, d)
    cat = _make_catalog(backend, spark)
    t1 = IndexedParquetTable(spark, d, ["k", "v"], catalog=cat)
    t2 = IndexedParquetTable(spark, d, ["k", "v"], catalog=cat)
    return t1, t2


@pytest.mark.parametrize("two_writers", BACKENDS, indirect=True)
def test_append_refuses_after_concurrent_delete(spark, two_writers):
    t1, t2 = two_writers
    n0 = t1.count_rows()
    deleted = {}

    def interleave(verb):
        deleted["n"] = t2.delete_where(col("v") == 7)

    t1._pre_commit_hook = interleave
    batch = spark.range(10).select(
        (F.col("id") + 5_000).cast("long").alias("k"),
        F.lit(1).cast("long").alias("v"))
    with pytest.raises(ConcurrentWriteError, match="another writer"):
        t1.append(batch)
    t1._pre_commit_hook = None
    # state is the FIRST committer's (t2's delete), nothing landed
    assert deleted["n"] > 0
    assert not [f for f in os.listdir(t1.data_dir)
                if f.startswith("insert_")]
    assert t1.count_rows() == n0 - deleted["n"]
    # a plain retry (fresh version read) succeeds
    assert t1.append(batch) == 10
    assert t1.count_rows() == n0 - deleted["n"] + 10


@pytest.mark.parametrize("two_writers", BACKENDS, indirect=True)
def test_delete_refuses_after_concurrent_append(spark, two_writers):
    t1, t2 = two_writers
    n0 = t1.count_rows()
    batch = spark.range(5).select(
        (F.col("id") + 9_000).cast("long").alias("k"),
        F.lit(2).cast("long").alias("v"))

    def interleave(verb):
        t2.append(batch)

    t1._pre_commit_hook = interleave
    with pytest.raises(ConcurrentWriteError, match="another writer"):
        t1.delete_where(col("v") == 3)
    t1._pre_commit_hook = None
    # no deletion vector committed; the append (first committer) holds
    assert t1.catalog.get_dv_ranges() == {}
    t1.refresh()
    assert t1.count_rows() == n0 + 5
    # retry applies against the post-append state
    n_del = t1.delete_where(col("v") == 3)
    assert n_del > 0
    assert t1.count_rows() == n0 + 5 - n_del


@pytest.mark.parametrize("two_writers", BACKENDS, indirect=True)
def test_update_refuses_before_landing(spark, two_writers):
    t1, t2 = two_writers

    def interleave(verb):
        t2.delete_where(col("k") == 999)

    t1._pre_commit_hook = interleave
    with pytest.raises(ConcurrentWriteError):
        t1.update_where(col("v") == 11, {"v": "v + 1000"})
    t1._pre_commit_hook = None
    # the update gate fires BEFORE anything lands: zero update files
    assert not [f for f in os.listdir(t1.data_dir)
                if f.startswith("update_")]
    assert t1.query(col("v") > 999).count() == 0


def test_version_monotonic_per_verb(spark, tmp_path):
    d = str(tmp_path / "ccr_mono")
    _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    assert t.catalog.version() == 0
    t.append(spark.range(3).select(
        (F.col("id") + 7_000).cast("long").alias("k"),
        F.lit(4).cast("long").alias("v")))
    assert t.catalog.version() == 1
    t.delete_where(col("k") == 7_001)
    assert t.catalog.version() == 2
    t.snapshot()
    t.expire_snapshots(keep_last=1)
    assert t.catalog.version() == 3


def test_cas_across_two_connections_same_db(tmp_path):
    """The true multi-process shape: two separate sqlite connections
    to one catalog database file; the CAS serializes them."""
    p = str(tmp_path / "cat.db")
    a = SqliteIndexCatalog(p)
    a.initialize({"k": "int"})
    b = SqliteIndexCatalog(p)
    b.initialize({"k": "int"})
    assert a.version() == b.version() == 0
    assert b.commit_version(0, "append") == 1
    with pytest.raises(ConcurrentWriteError, match="version moved"):
        a.commit_version(0, "delete")
    assert a.version() == 1
    assert a.commit_version(1, "delete") == 2


def test_cas_on_format_paramstyle_dbapi():
    """The commit-version CAS must survive the qmark -> %s placeholder
    translation a psycopg2/MySQLdb-style driver needs (the remote-
    catalog shape); _FormatParamConn asserts no qmark leaks."""
    from test_catalog_backends import _FormatParamConn

    cat = DBAPIIndexCatalog(_FormatParamConn, paramstyle="format")
    cat.initialize({"k": "int"})
    assert cat.version() == 0
    assert cat.commit_version(0, "append") == 1
    with pytest.raises(ConcurrentWriteError, match="version moved"):
        cat.commit_version(0, "delete")
    assert cat.commit_version(1, "optimize") == 2


def test_catalog_without_version_extension_opts_out(spark, tmp_path):
    """A custom catalog lacking version()/commit_version keeps the
    pre-round-11 ungated behavior instead of crashing."""
    d = str(tmp_path / "ccr_legacy")
    _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])

    class _Legacy:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            if name in ("version", "commit_version"):
                raise AttributeError(name)
            return getattr(self._inner, name)

    t.catalog = _Legacy(t.catalog)
    assert t.append(spark.range(2).select(
        (F.col("id") + 8_000).cast("long").alias("k"),
        F.lit(5).cast("long").alias("v"))) == 2
