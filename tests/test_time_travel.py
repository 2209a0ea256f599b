"""Snapshot isolation / time travel over the external index
(catalog.create_snapshot / snapshot_files, table.snapshot /
query(as_of=...)).

Contract: an as-of read sees EXACTLY the files recorded at snapshot
time; later arrivals (indexed by refresh) are invisible to it; a
snapshot any of whose files changed or vanished since raises instead of
silently answering differently (the Delta after-VACUUM posture). The
reference's maintenance loop re-indexes arrivals (index.rs:179) but has
no reader-side versioning — this is the extension that closes it."""

import os

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import Col, Lit
from datafusion_async_parquet_index_spark.sources.catalog import (
    SqliteIndexCatalog,
)
from datafusion_async_parquet_index_spark.sources.df_catalog import (
    DataFrameIndexCatalog,
)
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)


def _one_file(spark, df, path):
    import shutil
    tmp = path + "_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    os.replace(os.path.join(tmp, part), path)
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.parametrize("backend", ["sqlite", "dataframe"])
def test_asof_excludes_later_arrivals(spark, tmp_path, backend):
    d = str(tmp_path / f"tt_{backend}")
    base = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    _one_file(spark, base.filter(F.col("k") < 50),
              os.path.join(d, "base.parquet"))
    cat = (SqliteIndexCatalog() if backend == "sqlite"
           else DataFrameIndexCatalog(spark))
    t = IndexedParquetTable(spark, d, index_columns=["v"], catalog=cat)
    snap = t.snapshot()
    _one_file(spark, base.filter(F.col("k") >= 50),
              os.path.join(d, "late.parquet"))
    t.refresh()
    assert t.query(None).count() == 100
    assert t.query(None, as_of=snap).count() == 50
    # pruned as-of plan: predicate + snapshot compose
    pred = Col("v") >= Lit(200)
    dec = t.plan_scan(pred, as_of=snap)
    assert "late.parquet" not in dec.files_scanned
    got = sorted(r["k"] for r in t.query(pred, as_of=snap).collect())
    assert got == list(range(20, 50))
    # a snapshot taken NOW sees both files
    snap2 = t.snapshot()
    assert t.query(None, as_of=snap2).count() == 100
    # and the old snapshot still answers the old way (isolation)
    assert t.query(None, as_of=snap).count() == 50


def test_unknown_snapshot_raises(spark, tmp_path):
    d = str(tmp_path / "tt_unknown")
    _one_file(spark, spark.range(10).select(F.col("id").alias("v")),
              os.path.join(d, "f.parquet"))
    t = IndexedParquetTable(spark, d, index_columns=["v"])
    with pytest.raises(KeyError):
        t.query(None, as_of=99)


def test_vanished_file_breaks_snapshot_loudly(spark, tmp_path):
    d = str(tmp_path / "tt_vanish")
    base = spark.range(40).select(F.col("id").alias("v"))
    _one_file(spark, base.filter(F.col("v") < 20),
              os.path.join(d, "a.parquet"))
    _one_file(spark, base.filter(F.col("v") >= 20),
              os.path.join(d, "b.parquet"))
    t = IndexedParquetTable(spark, d, index_columns=["v"])
    snap = t.snapshot()
    os.remove(os.path.join(d, "b.parquet"))
    t.refresh()
    assert t.query(None).count() == 20  # current era is consistent
    with pytest.raises(ValueError, match="no longer reconstructable"):
        t.query(None, as_of=snap)


def test_rewritten_file_breaks_snapshot_loudly(spark, tmp_path):
    d = str(tmp_path / "tt_rewrite")
    _one_file(spark, spark.range(30).select(F.col("id").alias("v")),
              os.path.join(d, "a.parquet"))
    t = IndexedParquetTable(spark, d, index_columns=["v"])
    snap = t.snapshot()
    # in-place rewrite with different contents (different size)
    _one_file(spark, spark.range(500).select(F.col("id").alias("v")),
              os.path.join(d, "a.parquet"))
    t.refresh()
    with pytest.raises(ValueError, match="no longer reconstructable"):
        t.query(None, as_of=snap)


def test_snapshot_of_empty_catalog(spark, tmp_path):
    d = str(tmp_path / "tt_empty")
    os.makedirs(d)
    t = IndexedParquetTable(spark, d, index_columns=["v"])
    snap = t.snapshot()
    assert t.catalog.snapshot_files(snap) == {}
    _one_file(spark, spark.range(5).select(F.col("id").alias("v")),
              os.path.join(d, "f.parquet"))
    t.refresh()
    assert t.query(None).count() == 5
    assert t.query(None, as_of=snap).count() == 0


def test_snapshot_survives_sqlite_reopen(spark, tmp_path):
    """Snapshots are catalog rows, so a file-backed catalog reopened in
    a new process-equivalent still serves them."""
    d = str(tmp_path / "tt_persist")
    db = str(tmp_path / "tt.db")
    base = spark.range(60).select(F.col("id").alias("v"))
    _one_file(spark, base.filter(F.col("v") < 30),
              os.path.join(d, "a.parquet"))
    t = IndexedParquetTable(spark, d, index_columns=["v"],
                            catalog=SqliteIndexCatalog(db))
    snap = t.snapshot()
    _one_file(spark, base.filter(F.col("v") >= 30),
              os.path.join(d, "b.parquet"))
    t.refresh()
    t.catalog.close()
    t2 = IndexedParquetTable(spark, d, index_columns=["v"],
                             catalog=SqliteIndexCatalog(db))
    assert t2.query(None, as_of=snap).count() == 30
    assert t2.query(None).count() == 60


def test_snapshot_delta_and_incremental_read(spark, tmp_path):
    """The delta manifest lists exactly the arrivals between snapshots;
    read_delta returns exactly their rows; removed files appear in the
    manifest but never break the read; in-place rewrites do."""
    d = str(tmp_path / "tt_delta")
    base = spark.range(90).select(F.col("id").alias("v"))
    _one_file(spark, base.filter(F.col("v") < 30),
              os.path.join(d, "a.parquet"))
    t = IndexedParquetTable(spark, d, index_columns=["v"])
    s1 = t.snapshot()
    _one_file(spark, base.filter((F.col("v") >= 30) & (F.col("v") < 60)),
              os.path.join(d, "b.parquet"))
    t.refresh()
    s2 = t.snapshot()
    delta = t.snapshot_delta(s1, s2)
    assert delta == {"added": ["b.parquet"], "removed": [], "changed": []}
    got = sorted(r["v"] for r in t.read_delta(s1, s2).collect())
    assert got == list(range(30, 60))
    # empty delta: same snapshot twice
    assert t.read_delta(s2, s2).count() == 0
    # removal shows in the manifest; the delta READ (added files only)
    # still works
    os.remove(os.path.join(d, "a.parquet"))
    _one_file(spark, base.filter(F.col("v") >= 60),
              os.path.join(d, "c.parquet"))
    t.refresh()
    d3 = t.snapshot_delta(s2)
    assert d3["added"] == ["c.parquet"] and d3["removed"] == ["a.parquet"]
    assert t.read_delta(s2).count() == 30
    # a file rewritten after s2 but absent FROM s2 counts as added (its
    # current contents are the delta) — only rewrites of files the base
    # snapshot RECORDED refuse:
    _one_file(spark, spark.range(500).select(F.col("id").alias("v")),
              os.path.join(d, "b.parquet"))  # b IS in s2
    t.refresh()
    with pytest.raises(ValueError, match="changed in place"):
        t.read_delta(s2)


def test_asof_dict_fold(spark, tmp_path):
    """group_counts composes with snapshots: yesterday's label
    distribution folds from the snapshot's files only — zero I/O in
    both eras."""
    d = str(tmp_path / "tt_dict")
    base = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)]
        + [(i + 100, "c") for i in range(50)], "k LONG, s STRING")
    _one_file(spark, base.filter(F.col("k") < 100),
              os.path.join(d, "old.parquet"))
    t = IndexedParquetTable(spark, d, index_columns=["k"],
                            dict_columns=["s"])
    snap = t.snapshot()
    _one_file(spark, base.filter(F.col("k") >= 100),
              os.path.join(d, "new.parquet"))
    t.refresh()
    assert t.group_counts("s") == {"a": 50, "b": 50, "c": 50}
    assert t.group_counts("s", as_of=snap) == {"a": 50, "b": 50}
    assert t.distinct_values("s", as_of=snap) == ["a", "b"]


@pytest.mark.parametrize("backend", ["sqlite", "dataframe"])
def test_expire_snapshots_retention(spark, tmp_path, backend):
    """expire_snapshots keeps the newest N; expired ids become unknown
    (KeyError on as-of — the same loud contract as a broken snapshot);
    new snapshot ids keep increasing monotonically past expiry."""
    d = str(tmp_path / f"tt_expire_{backend}")
    _one_file(spark, spark.range(10).select(F.col("id").alias("v")),
              os.path.join(d, "f.parquet"))
    cat = (SqliteIndexCatalog() if backend == "sqlite"
           else DataFrameIndexCatalog(spark))
    t = IndexedParquetTable(spark, d, index_columns=["v"], catalog=cat)
    s1, s2, s3 = t.snapshot(), t.snapshot(), t.snapshot()
    expired = t.catalog.expire_snapshots(keep_last=1)
    assert expired == [s1, s2]
    assert t.query(None, as_of=s3).count() == 10
    with pytest.raises(KeyError):
        t.query(None, as_of=s1)
    s4 = t.snapshot()
    assert s4 > s3  # ids never reused after expiry
    assert t.query(None, as_of=s4).count() == 10


def test_expired_ids_never_reused(spark, tmp_path):
    """Expiring EVERY snapshot must not let ids restart: a stale
    reference to an expired id raises instead of silently resolving to
    a newer snapshot that happens to share the number."""
    d = str(tmp_path / "tt_noreuse")
    _one_file(spark, spark.range(5).select(F.col("id").alias("v")),
              os.path.join(d, "f.parquet"))
    t = IndexedParquetTable(spark, d, index_columns=["v"])
    s1 = t.snapshot()
    assert t.catalog.expire_snapshots(keep_last=0) == [s1]
    s2 = t.snapshot()
    assert s2 > s1
    with pytest.raises(KeyError):
        t.query(None, as_of=s1)


def test_read_delta_explicit_target_guards_added_rewrites(spark, tmp_path):
    """A file ADDED between base and target, then rewritten in place
    AFTER target, must make read_delta(base, target) raise — the two
    snapshot manifests alone cannot see the rewrite (the file is
    'added' in both comparisons), so the added files are verified
    against the live catalog."""
    d = str(tmp_path / "tt_delta_guard")
    base = spark.range(60).select(F.col("id").alias("v"))
    _one_file(spark, base.filter(F.col("v") < 20),
              os.path.join(d, "a.parquet"))
    t = IndexedParquetTable(spark, d, index_columns=["v"])
    s1 = t.snapshot()
    _one_file(spark, base.filter((F.col("v") >= 20) & (F.col("v") < 40)),
              os.path.join(d, "b.parquet"))
    t.refresh()
    s2 = t.snapshot()
    assert t.read_delta(s1, s2).count() == 20
    # rewrite the ADDED file after s2 (different size)
    _one_file(spark, spark.range(500).select(F.col("id").alias("v")),
              os.path.join(d, "b.parquet"))
    t.refresh()
    with pytest.raises(ValueError, match="no longer reconstructable"):
        t.read_delta(s1, s2)


def test_table_expire_verb_and_cli(spark, tmp_path, capsys, monkeypatch):
    """Round 10: expire_snapshots is a first-class TABLE verb with a
    CLI spelling — retention over a DML'd table drops the old
    manifests AND their copied DV state; the kept snapshot still
    serves, live answers unchanged."""
    from datafusion_async_parquet_index_spark import cli
    from datafusion_async_parquet_index_spark.plans.expr import col

    d = str(tmp_path / "tt_verb_expire")
    _one_file(spark, spark.range(100).select(F.col("id").alias("v")),
              os.path.join(d, "f.parquet"))
    db = str(tmp_path / "expire.db")
    t = IndexedParquetTable(spark, d, index_columns=["v"],
                            catalog=SqliteIndexCatalog(db))
    s1 = t.snapshot()
    t.delete_where(col("v") < 10)
    s2 = t.snapshot()
    assert t.expire_snapshots(keep_last=1) == [s1]
    assert t.count_rows(as_of=s2) == 90 == t.count_rows()
    with pytest.raises(KeyError):
        t.count_rows(as_of=s1)
    # CLI spelling over the same persisted catalog
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    t.snapshot()
    rc = cli.main(["expire", d, "--columns", "v", "--keep", "1",
                   "--catalog", db])
    out = capsys.readouterr().out
    assert rc == 0 and "expired 1 snapshots" in out
    assert cli.main(["expire", d, "--columns", "v", "--keep", "1"]) == 2


def test_cli_expire_refuses_nonpositive_keep(spark, tmp_path, capsys,
                                             monkeypatch):
    """--keep 0 / negative would expire EVERY snapshot; the CLI
    refuses before touching the catalog (review r10)."""
    from datafusion_async_parquet_index_spark import cli

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    d = str(tmp_path / "cli_keep0")
    _one_file(spark, spark.range(5).select(F.col("id").alias("v")),
              os.path.join(d, "f.parquet"))
    db = str(tmp_path / "keep0.db")
    t = IndexedParquetTable(spark, d, index_columns=["v"],
                            catalog=SqliteIndexCatalog(db))
    s = t.snapshot()
    assert cli.main(["expire", d, "--columns", "v", "--keep", "0",
                     "--catalog", db]) == 2
    assert cli.main(["expire", d, "--columns", "v", "--keep", "-3",
                     "--catalog", db]) == 2
    # snapshot survived both refusals
    assert t.count_rows(as_of=s) == 5
