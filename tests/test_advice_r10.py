"""Regression tests for the round-9 VERDICT/ADVICE findings:

1. (verdict #2 / advice) Snapshot reconstruction checks must be
   CONTENT-aware: the manifest records (size, mtime_ns, footer_md5)
   and both the as-of guard and restore()'s pre-mutation check compare
   with the same size → footer_md5 → mtime_ns precedence the live DV
   retention uses. A same-size rewrite between snapshot and as-of
   read/restore must refuse LOUDLY instead of serving the recorded
   deletion vectors against a new row layout; an identical-content
   replace (fresh mtime, same bytes) must keep serving.
2. Legacy manifests (pre-migration rows, NULL discriminators) fall
   back to the old size-only convention — no refusal storm on old
   persisted catalogs.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)

from fixture_io import one_file as _one_file


def _corpus(spark, d):
    os.makedirs(d, exist_ok=True)
    base = spark.range(1_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 7 % 100).cast("long").alias("v"))
    _one_file(base.filter(F.col("k") < 500).orderBy("k"), d, "a.parquet")
    _one_file(base.filter(F.col("k") >= 500).orderBy("k"), d, "b.parquet")
    return base


def _table(spark, d, backend):
    if backend == "df":
        from datafusion_async_parquet_index_spark.sources.df_catalog import (
            DataFrameIndexCatalog,
        )
        return IndexedParquetTable(spark, d, ["k", "v"],
                                   catalog=DataFrameIndexCatalog(spark))
    return IndexedParquetTable(spark, d, ["k", "v"])


def _same_size_flip(path):
    """Rewrite the file in place: identical byte size, one flipped byte
    in the data region (not the footer), fresh mtime via os.replace —
    the exact shape of an out-of-band compaction/rewrite landing at
    the same size."""
    size_before = os.path.getsize(path)
    blob = bytearray(open(path, "rb").read())
    blob[len(blob) // 3] ^= 0xFF
    tmp = path + ".swap"
    with open(tmp, "wb") as fh:
        fh.write(bytes(blob))
    os.replace(tmp, path)
    assert os.path.getsize(path) == size_before


BACKENDS = ["sqlite", "df"]


@pytest.mark.parametrize("backend", BACKENDS)
def test_asof_guard_refuses_same_size_rewrite(spark, tmp_path, backend):
    """Snapshot, then a same-size rewrite re-indexed by refresh(): the
    as-of read must refuse loudly — the snapshot's recorded DV
    positions index the OLD layout, and serving them against the new
    bytes is exactly the silently-wrong-rows failure the contract
    forbids. Size alone cannot see this; the manifest footer_md5
    does."""
    d = str(tmp_path / f"asof_{backend}")
    _corpus(spark, d)
    t = _table(spark, d, backend)
    t.delete_where(col("k") < 10)              # DV on a.parquet
    s = t.snapshot()
    assert t.count_rows(as_of=s) == 990        # serves fine pre-rewrite
    _same_size_flip(os.path.join(d, "a.parquet"))
    t.refresh()                                # re-indexes the new bytes
    with pytest.raises(ValueError, match="no longer reconstructable"):
        t.count_rows(as_of=s)
    with pytest.raises(ValueError, match="no longer reconstructable"):
        t.query(col("k") < 100, as_of=s).collect()


@pytest.mark.parametrize("backend", BACKENDS)
def test_asof_guard_identical_replace_keeps_serving(spark, tmp_path,
                                                    backend):
    """The content judge must not over-refuse: a byte-identical
    replace (backup restore / rsync — fresh mtime, same bytes) between
    snapshot and as-of read keeps serving; the recorded positions
    still index the same layout."""
    d = str(tmp_path / f"asof_ok_{backend}")
    _corpus(spark, d)
    t = _table(spark, d, backend)
    t.delete_where(col("k") < 10)
    s = t.snapshot()
    path = os.path.join(d, "a.parquet")
    shutil.copyfile(path, path + ".swap")
    os.replace(path + ".swap", path)           # fresh mtime, same bytes
    t.refresh()
    assert t.count_rows(as_of=s) == 990


@pytest.mark.parametrize("backend", BACKENDS)
def test_restore_refuses_same_size_rewrite(spark, tmp_path, backend):
    """restore()'s pre-mutation check probes the DISK: an out-of-band
    same-size rewrite of a recorded file (no refresh in between —
    nothing else had a chance to notice) must refuse BEFORE anything
    is removed or any DV is re-applied; the table state is untouched
    afterwards."""
    d = str(tmp_path / f"restore_{backend}")
    _corpus(spark, d)
    t = _table(spark, d, backend)
    s0 = t.snapshot()
    nupd = t.update_where(col("k") < 5, {"v": "v + 1"})
    assert nupd == 5
    files_before = {f[0] for f in t.catalog.all_files()}
    _same_size_flip(os.path.join(d, "b.parquet"))  # out-of-band
    with pytest.raises(ValueError, match="cannot be reconstructed"):
        t.restore(s0)
    # nothing was mutated: the update's landed file and catalog rows
    # and the live DVs are all still there
    assert {f[0] for f in t.catalog.all_files()} == files_before
    assert t.catalog.get_dv_ranges()


@pytest.mark.parametrize("backend", BACKENDS)
def test_restore_identical_replace_passes(spark, tmp_path, backend):
    """Byte-identical replace of a recorded file between snapshot and
    restore: md5 matches, restore proceeds and reverts the table to
    the snapshot's answers."""
    d = str(tmp_path / f"restore_ok_{backend}")
    base = _corpus(spark, d)
    t = _table(spark, d, backend)
    n0 = t.count_rows()
    s0 = t.snapshot()
    t.update_where(col("k") < 5, {"v": "v + 1"})
    path = os.path.join(d, "a.parquet")
    shutil.copyfile(path, path + ".swap")
    os.replace(path + ".swap", path)           # fresh mtime, same bytes
    info = t.restore(s0)
    assert info["files_removed"] >= 1 and info["dv_files"] == 0
    assert t.count_rows() == n0 == base.count()


def test_legacy_manifest_rows_fall_back_to_size_only(spark, tmp_path):
    """Snapshots taken before the migration carry NULL discriminators;
    the guard must keep the old size-only convention for them (no
    refusal storm on old persisted catalogs) — simulated by nulling
    the manifest columns in the SQLite backend."""
    d = str(tmp_path / "legacy")
    _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    s = t.snapshot()
    t.catalog._exec(
        "UPDATE catalog_snapshots SET mtime_ns = NULL, footer_md5 = NULL "
        "WHERE snapshot_id = ?", (s,))
    _same_size_flip(os.path.join(d, "a.parquet"))
    t.refresh()
    # size-only legacy row: the rewrite is invisible (old behavior),
    # the read serves — documenting the deliberate fallback
    assert t.count_rows(as_of=s) == 1_000


def test_snapshot_manifest_parity_across_backends(spark, tmp_path):
    """snapshot_manifest()/file_identity() — the reconstruction
    check's two sides — must agree between the SQLite and DataFrame
    backends on the same corpus and carry real discriminators."""
    from datafusion_async_parquet_index_spark.sources.df_catalog import (
        DataFrameIndexCatalog,
    )
    d = str(tmp_path / "parity")
    _corpus(spark, d)
    t_sql = IndexedParquetTable(spark, d, ["k"])
    t_df = IndexedParquetTable(spark, d, ["k"],
                               catalog=DataFrameIndexCatalog(spark))
    s_sql, s_df = t_sql.snapshot(), t_df.snapshot()
    m_sql = t_sql.catalog.snapshot_manifest(s_sql)
    m_df = t_df.catalog.snapshot_manifest(s_df)
    assert m_sql == m_df
    assert t_sql.catalog.file_identity() == t_df.catalog.file_identity()
    for name, (size, mt, md5) in m_sql.items():
        p = os.path.join(d, name)
        assert size == os.path.getsize(p)
        assert mt == os.stat(p).st_mtime_ns
        assert md5 is not None and len(md5) == 32
    # snapshot_files stays the documented {name: size} view
    assert t_df.catalog.snapshot_files(s_df) == {
        n: ident[0] for n, ident in m_df.items()}


def test_read_delta_same_size_rewrite_refuses(spark, tmp_path):
    """A same-size rewrite of a file ADDED between two snapshots (then
    re-indexed) must refuse the historical delta read: the bytes on
    disk are no longer the rows that arrived in the era."""
    d = str(tmp_path / "delta")
    base = _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    s0 = t.snapshot()
    _one_file(base.limit(50).withColumn("k", F.col("k") + 10_000),
              d, "c.parquet")
    t.refresh()
    s1 = t.snapshot()
    assert t.read_delta(s0, s1).count() == 50
    _same_size_flip(os.path.join(d, "c.parquet"))
    t.refresh()
    with pytest.raises(ValueError, match="no longer"):
        t.read_delta(s0, s1).collect()


def test_identity_changed_precedence_table():
    """Exhaustive spec table for _identity_changed — the single rule
    every reconstruction check shares. Precedence: vanished → changed;
    size differs → changed; md5 known both sides → md5 decides
    (regardless of mtime); else mtime decides when both known; else
    size-only (unchanged)."""
    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable as T,
    )
    ch = T._identity_changed
    S, M1, M2 = 10, 111, 222
    A, B = "aa", "bb"
    assert ch((S, M1, A), None) is True                 # vanished
    assert ch((S, M1, A), (S + 1, M1, A)) is True       # size differs
    # md5 known both sides decides — even when mtime differs/matches
    assert ch((S, M1, A), (S, M2, A)) is False          # same content
    assert ch((S, M1, A), (S, M1, B)) is True           # same-size rewrite
    assert ch((S, None, A), (S, M2, B)) is True
    assert ch((S, None, A), (S, None, A)) is False
    # md5 unknown on either side → mtime decides when both known
    assert ch((S, M1, None), (S, M2, A)) is True
    assert ch((S, M1, A), (S, M2, None)) is True
    assert ch((S, M1, None), (S, M1, None)) is False
    # both discriminators unknown → size-only (legacy convention)
    assert ch((S, None, None), (S, M2, B)) is False
    assert ch((S, M1, A), (S, None, None)) is False
