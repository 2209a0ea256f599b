"""table.restore(snapshot_id) — Delta RESTORE TABLE ... TO VERSION
over the external index: the file set reverts to the snapshot's
manifest and the deletion-vector state to the snapshot's recorded
copy. Covers restore-to-origin, restore to a MID-era snapshot (its
own deletions re-apply), idempotency, the loud cannot-reconstruct /
unknown-id failures, and backend parity."""

import os

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)
from fixture_io import one_file


def _mk(spark, d, **kw):
    os.makedirs(d, exist_ok=True)
    base = spark.range(2_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 7 % 100).cast("long").alias("v"))
    one_file(base.filter(F.col("k") < 1_000).orderBy("k"), d, "a.parquet")
    one_file(base.filter(F.col("k") >= 1_000).orderBy("k"), d, "b.parquet")
    t = IndexedParquetTable(spark, d, ["k", "v"], sum_columns=["v"], **kw)
    return t, base


def test_restore_to_origin(spark, tmp_path):
    t, base = _mk(spark, str(tmp_path / "origin"))
    n0, (s0_sum, _) = t.count_rows(), t.sum_rows("v")
    s0 = t.snapshot()
    t.delete_where((col("v") % 5) == 2)
    t.update_where((col("v") % 7) == 3, {"v": "v + 1000"})
    assert t.count_rows() < n0
    info = t.restore(s0)
    assert info == {"files_removed": 1, "dv_files": 0}
    assert t.count_rows() == n0
    assert t.sum_rows("v")[0] == s0_sum
    assert t.last_sum_pushdown["partial_row_groups"] == 0
    # rows answer with ORIGINAL values on every surface
    got = sorted(r["v"] for r in t.query(col("k") < 20).collect())
    want = sorted(r["v"] for r in base.filter(F.col("k") < 20).collect())
    assert got == want


def test_restore_to_mid_era_reapplies_its_deletions(spark, tmp_path):
    """A snapshot taken AFTER a delete restores WITH that delete: the
    snapshot's recorded DV copy becomes live again, and later
    deletions are undone."""
    t, base = _mk(spark, str(tmp_path / "midera"))
    nd1 = t.delete_where((col("v") % 10) == 3)
    s1 = t.snapshot()
    n1 = t.count_rows()
    t.delete_where((col("v") % 10) == 4)   # post-snapshot delete
    assert t.count_rows() < n1
    info = t.restore(s1)
    assert info["files_removed"] == 0 and info["dv_files"] > 0
    assert t.count_rows() == n1 == base.count() - nd1
    live = base.filter(~(F.col("v") % 10 == 3))
    s, nn = t.sum_rows("v")
    exp = live.agg(F.sum("v").alias("s"), F.count("v").alias("n")).head()
    assert (s, nn) == (exp["s"], exp["n"])
    # era-4 rows are BACK, era-3 rows stay deleted
    assert t.query((col("v") % 10) == 4).count() == \
        base.filter(F.col("v") % 10 == 4).count()
    assert t.query((col("v") % 10) == 3).count() == 0


def test_restore_is_idempotent(spark, tmp_path):
    t, base = _mk(spark, str(tmp_path / "idem"))
    s0 = t.snapshot()
    t.delete_where(col("k") < 100)
    t.restore(s0)
    info2 = t.restore(s0)                  # nothing left to undo
    assert info2 == {"files_removed": 0, "dv_files": 0}
    assert t.count_rows() == base.count()


def test_restore_refuses_reconstruction_failure(spark, tmp_path):
    """A recorded file rewritten since (compaction) fails LOUDLY
    before anything mutates — same contract as as-of reads."""
    d = str(tmp_path / "recon")
    t, base = _mk(spark, d)
    s0 = t.snapshot()
    t.delete_where(col("k") < 100)
    t.compact_deletes()                    # rewrites a.parquet
    n_after = t.count_rows()
    with pytest.raises(ValueError, match="cannot be reconstructed"):
        t.restore(s0)
    assert t.count_rows() == n_after       # nothing was touched
    with pytest.raises(KeyError):
        t.restore(99_999)                  # unknown id


def test_restore_df_backend_parity(spark, tmp_path):
    from datafusion_async_parquet_index_spark.sources.df_catalog import (
        DataFrameIndexCatalog,
    )
    t, base = _mk(spark, str(tmp_path / "dfback"),
                  catalog=DataFrameIndexCatalog(spark))
    nd1 = t.delete_where((col("v") % 10) == 3)
    s1 = t.snapshot()
    t.update_where((col("v") % 10) == 4, {"v": "v + 1000"})
    info = t.restore(s1)
    assert info["files_removed"] == 1 and info["dv_files"] > 0
    assert t.count_rows() == base.count() - nd1
    assert t.query(col("v") >= 1000).count() == 0   # update undone


def test_restore_refuses_to_break_newer_live_snapshot(spark, tmp_path):
    """Round 10: removing a post-snapshot file is PHYSICAL here (no
    Delta-style retained history), so a restore that would delete a
    file a LIVE NEWER snapshot still references must refuse loudly
    BEFORE mutating anything — else that snapshot silently loses
    reconstructability. Expiring the newer snapshot (or force=True)
    unblocks; force leaves the newer era refusing loudly, never
    answering differently."""
    t, base = _mk(spark, str(tmp_path / "newer"))
    n0 = t.count_rows()
    s0 = t.snapshot()
    t.append(base.limit(30).selectExpr("k + 100000 AS k", "v"))
    s1 = t.snapshot()                       # references the insert file
    n1 = t.count_rows()
    files_before = {f[0] for f in t.catalog.all_files()}
    with pytest.raises(ValueError, match="live newer snapshots"):
        t.restore(s0)
    # nothing mutated: file set and both eras intact
    assert {f[0] for f in t.catalog.all_files()} == files_before
    assert t.count_rows(as_of=s1) == n1 and t.count_rows() == n1
    # expiring the blocker unblocks the plain restore
    t2, base2 = _mk(spark, str(tmp_path / "newer2"))
    s0b = t2.snapshot()
    t2.append(base2.limit(30).selectExpr("k + 100000 AS k", "v"))
    t2.snapshot()
    t2.expire_snapshots(keep_last=0)        # all snapshots... expired
    with pytest.raises(KeyError):
        t2.restore(s0b)                     # s0b itself expired too
    # force=True: proceeds, newer snapshot becomes loudly broken
    info = t.restore(s0, force=True)
    assert info["files_removed"] == 1
    assert t.count_rows() == n0
    with pytest.raises(ValueError, match="no longer reconstructable"):
        t.count_rows(as_of=s1)
