"""Regression tests for the round-8 ADVICE findings:

1. (medium) update_where / merge_upsert must not leave landed
   new-version files on disk when the follow-up delete raises (e.g.
   the DV_MAX_DELETED_PER_CALL cap): the next refresh() would silently
   index them as duplicate rows.
2. (low) A rewrite landing at the IDENTICAL byte size must still be
   detected: change detection is (size, mtime_ns) — the discriminator
   the compaction-marker recovery already trusts — in BOTH the
   incremental-refresh skip and the catalog's DV-retention rule. This
   closes the torn-marker residual hole without per-file fsync.
3. (low) maintenance_report reads snapshot counts through a public
   backend method, not a private SQL probe.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.catalog import (
    SqliteIndexCatalog,
)
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)


from fixture_io import one_file as _one_file_impl


def _one_file(df, d, name, block=16384):
    _one_file_impl(df, d, name, block=block)


def _corpus(spark, d):
    os.makedirs(d, exist_ok=True)
    base = spark.range(1_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 7 % 100).cast("long").alias("v"))
    _one_file(base.filter(F.col("k") < 500).orderBy("k"), d, "a.parquet")
    _one_file(base.filter(F.col("k") >= 500).orderBy("k"), d, "b.parquet")
    return base


# -- finding 2: same-size rewrite detection (mtime_ns discriminator) ---

def test_same_size_rewrite_reindexed_and_dv_dropped(spark, tmp_path):
    """A CONTENT swap that lands at the identical byte size (fresh
    mtime via os.replace, different bytes) must defeat the refresh
    short-circuit: the file is re-indexed and its stale DV (positions
    index the OLD layout) is dropped — the exact shape a torn/lost
    compact marker leaves behind. Simulated with a one-byte flip in
    the data region: same size, new mtime, different content."""
    d = str(tmp_path / "samesize")
    _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    t.delete_where(col("k") < 10)          # DV on a.parquet
    assert "a.parquet" in t.catalog.get_dv_ranges()
    path = os.path.join(d, "a.parquet")
    size_before = os.path.getsize(path)
    blob = bytearray(open(path, "rb").read())
    mid = len(blob) // 3                   # data region, not the footer
    blob[mid] ^= 0xFF
    tmp = path + ".swap"
    with open(tmp, "wb") as fh:
        fh.write(bytes(blob))
    os.replace(tmp, path)
    assert os.path.getsize(path) == size_before
    t.refresh()
    assert "a.parquet" not in t.catalog.get_dv_ranges(), \
        "same-size rewrite kept a stale deletion vector"
    # the re-index also refreshed the file row's mtime
    _, mt = t.catalog.file_meta()["a.parquet"]
    assert mt == os.stat(path).st_mtime_ns


def test_identical_content_replace_preserves_dv(spark, tmp_path):
    """Review r9 finding: a byte-identical replace (backup restore /
    rsync without timestamp preservation — fresh mtime, same bytes)
    must NOT drop the deletion vector: the positions still index the
    same layout, and dropping would silently resurrect every
    logically deleted row. The footer-md5 content discriminator keeps
    it, and the re-index records the new mtime so later refreshes
    skip again."""
    d = str(tmp_path / "restore")
    base = _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    ndel = t.delete_where(col("k") < 10)   # DV on a.parquet
    path = os.path.join(d, "a.parquet")
    tmp = path + ".swap"
    shutil.copyfile(path, tmp)             # byte-identical copy
    os.replace(tmp, path)                  # fresh mtime, same bytes
    t.refresh()
    assert "a.parquet" in t.catalog.get_dv_ranges(), \
        "identical-content replace resurrected deleted rows"
    assert t.count_rows() == base.count() - ndel
    # mtime learned: the next refresh short-circuits again
    _, mt = t.catalog.file_meta()["a.parquet"]
    assert mt == os.stat(path).st_mtime_ns


def test_unchanged_bytes_refresh_keeps_dv_and_skips(spark, tmp_path):
    """No touch, no rewrite: refresh() must keep skipping the file
    (steady-state O(changed files)) and the DV must survive — the
    mtime discriminator must not create false positives."""
    d = str(tmp_path / "unchanged")
    base = _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    ndel = t.delete_where(col("k") < 10)
    t.refresh()
    assert t.catalog.get_dv_ranges(), "refresh dropped DV on unchanged bytes"
    assert t.count_rows() == base.count() - ndel


def test_file_meta_parity_across_backends(spark, tmp_path):
    """file_meta() — the incremental skip's change-detection view —
    must agree between the SQLite and DataFrame backends on the same
    corpus, and record a real mtime for every file."""
    from datafusion_async_parquet_index_spark.sources.df_catalog import (
        DataFrameIndexCatalog,
    )
    d = str(tmp_path / "meta")
    _corpus(spark, d)
    t_sql = IndexedParquetTable(spark, d, ["k"])
    t_df = IndexedParquetTable(spark, d, ["k"],
                               catalog=DataFrameIndexCatalog(spark))
    m_sql, m_df = t_sql.catalog.file_meta(), t_df.catalog.file_meta()
    assert m_sql == m_df
    assert set(m_sql) == {"a.parquet", "b.parquet"}
    for name, (size, mt) in m_sql.items():
        p = os.path.join(d, name)
        assert (size, mt) == (os.path.getsize(p), os.stat(p).st_mtime_ns)


# -- finding 1 (medium): no stranded landed batches; single-pass UPDATE

def test_update_where_single_pruned_read(spark, tmp_path, monkeypatch):
    """VERDICT r8 ask #5: update_where must scan the victim files
    ONCE — the (file, position) pairs for the delete come from the
    same cached read that builds the update batch. Asserted via the
    plan log: exactly one plan_scan per UPDATE."""
    d = str(tmp_path / "singlepass")
    base = _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"], sum_columns=["v"])
    calls = []
    orig = t.plan_scan

    def counting(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    monkeypatch.setattr(t, "plan_scan", counting)
    n = t.update_where(col("k") < 20, {"v": "v + 1000"})
    assert n == 20
    assert len(calls) == 1, f"expected ONE pruned read, got {len(calls)}"
    rows = {r["k"]: r["v"] for r in t.query(col("k") < 20).collect()}
    want = {r["k"]: r["v"] + 1000 for r in
            base.filter(F.col("k") < 20).collect()}
    assert rows == want
    assert t.count_rows() == base.count()
    # SUM pushdown still exact after the single-pass DV commit
    s, _ = t.sum_rows("v")
    assert s == sum(r["v"] for r in base.collect()) + 20 * 1000


def test_update_where_over_cap_removes_landed_batch(spark, tmp_path):
    """A predicate matching more rows than DV_MAX_DELETED_PER_CALL
    must raise BEFORE any DV commits AND remove the landed new-version
    files — previously they stayed on disk and the next refresh()
    silently indexed them as duplicates (ADVICE r8, medium)."""
    d = str(tmp_path / "updcap")
    base = _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    t.DV_MAX_DELETED_PER_CALL = 50
    files_before = {f[0] for f in t.catalog.all_files()}
    with pytest.raises(ValueError, match="DV_MAX_DELETED_PER_CALL"):
        t.update_where(col("k") < 100, {"v": "v + 1"})
    # no stranded files on disk, nothing new indexed, no DVs, no dupes
    on_disk = {f for f in os.listdir(d) if f.endswith(".parquet")}
    assert on_disk == files_before
    t.refresh()
    assert {f[0] for f in t.catalog.all_files()} == files_before
    assert not t.catalog.get_dv_ranges()
    assert t.count_rows() == base.count()
    # values untouched
    assert t.query(col("k") == 5).head()["v"] == \
        base.filter(F.col("k") == 5).head()["v"]


def test_merge_upsert_over_cap_removes_landed_batch(spark, tmp_path):
    d = str(tmp_path / "mergecap")
    base = _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    t.DV_MAX_DELETED_PER_CALL = 50
    files_before = {f[0] for f in t.catalog.all_files()}
    updates = spark.range(100).select(
        F.col("id").cast("long").alias("k"),
        F.lit(7).cast("long").alias("v"))
    with pytest.raises(ValueError, match="DV_MAX_DELETED_PER_CALL"):
        t.merge_upsert(updates, "k")
    on_disk = {f for f in os.listdir(d) if f.endswith(".parquet")}
    assert on_disk == files_before
    t.refresh()
    assert not t.catalog.get_dv_ranges()
    assert t.count_rows() == base.count()


# -- finding 3 (low): public snapshot_count backend surface -----------

def test_snapshot_count_public_surface(spark, tmp_path):
    from datafusion_async_parquet_index_spark.sources.df_catalog import (
        DataFrameIndexCatalog,
    )
    d = str(tmp_path / "snapcount")
    _corpus(spark, d)
    for cat in (None, DataFrameIndexCatalog(spark)):
        kw = {"catalog": cat} if cat is not None else {}
        t = IndexedParquetTable(spark, d, ["k"], **kw)
        assert t.catalog.snapshot_count() == 0
        assert t.maintenance_report()["snapshots"] == 0
        t.snapshot()
        t.snapshot()
        assert t.catalog.snapshot_count() == 2
        assert t.maintenance_report()["snapshots"] == 2
        t.catalog.expire_snapshots(keep_last=1)
        assert t.maintenance_report()["snapshots"] == 1


def test_legacy_catalog_rows_compare_size_only(spark, tmp_path):
    """A persisted catalog built before the mtime column (NULL
    mtime_ns) must keep the old size-only convention: unchanged size →
    skip + DV preserved; the row learns its mtime only when the file
    actually changes."""
    d = str(tmp_path / "legacy")
    base = _corpus(spark, d)
    db = str(tmp_path / "cat.sqlite")
    t1 = IndexedParquetTable(spark, d, ["k", "v"],
                             catalog=SqliteIndexCatalog(db))
    ndel = t1.delete_where(col("k") < 10)
    # simulate a legacy catalog: erase the recorded mtimes
    t1.catalog._exec("UPDATE file_statistics SET mtime_ns = NULL")
    t2 = IndexedParquetTable(spark, d, ["k", "v"],
                             catalog=SqliteIndexCatalog(db),
                             incremental_attach=True)
    assert t2.catalog.get_dv_ranges(), \
        "legacy (NULL-mtime) rows must not drop DVs on unchanged size"
    assert t2.count_rows() == base.count() - ndel
