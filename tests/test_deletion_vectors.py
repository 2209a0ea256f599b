"""Deletion vectors (merge-on-read row-level deletes): delete_where /
compact_deletes / merge_upsert and the DV-awareness of every read and
catalog-answer surface.

Design (Delta/Iceberg deletion vectors re-expressed as catalog
metadata): one pruned job finds matching (file, row position) pairs via
``_metadata.row_index`` and their exact per-column sum contributions;
positions merge into per-file range-compressed vectors; reads
anti-filter them JVM-side (explode+hash anti-join on (file, row
position), broadcast under a cumulative position cap); COUNT/SUM/
VAR pushdowns subtract the recorded contributions exactly;
min/max/dict/topk/ndv/hist catalog answers refuse until compaction;
snapshots COPY the DV state so time travel serves every era with its
own deletions."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)


from fixture_io import one_file as _one_file_impl


def _one_file(df, d, name, block=16384):
    _one_file_impl(df, d, name, block=block)


@pytest.fixture()
def dv_table(spark, tmp_path):
    d = str(tmp_path / "dv")
    os.makedirs(d)
    base = spark.range(4_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 7 % 1000).cast("long").alias("v"),
        F.md5(F.col("id").cast("string")).alias("pay"))
    _one_file(base.filter(F.col("k") % 2 == 0).orderBy("k"),
              d, "even.parquet")
    _one_file(base.filter(F.col("k") % 2 == 1).orderBy("k"),
              d, "odd.parquet")
    t = IndexedParquetTable(spark, d, ["k", "v"], sum_columns=["v"])
    return t, base


DEL = (col("v") % 10) == 3          # hits odd ids only (7*9 = 63)


def LIVE():
    return ~((F.col("v") % 10) == 3)


def test_delete_where_counts_and_read_surfaces(spark, dv_table):
    t, base = dv_table
    n0 = t.count_rows()
    ndel = t.delete_where(DEL)
    assert ndel == base.filter(~LIVE()).count() > 0
    live = base.filter(LIVE())
    # every read surface excludes the deleted rows
    assert t.query(None).count() == n0 - ndel
    assert t.to_df().count() == n0 - ndel
    got = sorted(r["k"] for r in
                 t.query((col("v") >= 100) & (col("v") < 200)).collect())
    want = sorted(r["k"] for r in live.filter(
        (F.col("v") >= 100) & (F.col("v") < 200)).collect())
    assert got == want
    # registered view rides to_df -> also DV-filtered
    t.create_temp_view("dv_view")
    assert spark.sql("SELECT COUNT(*) c FROM dv_view").head()["c"] \
        == n0 - ndel


def test_delete_is_idempotent(spark, dv_table):
    t, _ = dv_table
    first = t.delete_where(DEL)
    assert first > 0
    assert t.delete_where(DEL) == 0  # already-deleted rows are invisible


def test_count_sum_var_pushdowns_stay_exact(spark, dv_table):
    t, base = dv_table
    t.delete_where(DEL)
    live = base.filter(LIVE())
    exp = live.agg(F.count("*").alias("n"), F.sum("v").alias("s"),
                   F.sum(F.col("v").cast("decimal(38,0)") * F.col("v"))
                   .alias("sq")).head()
    assert t.count_rows() == exp["n"]
    s, nn = t.sum_rows("v")
    assert (s, nn) == (exp["s"], exp["n"])
    # pure catalog arithmetic — no boundary scan
    assert t.last_sum_pushdown["partial_row_groups"] == 0
    s_, sq_, n_ = t.sum_sq_rows("v")
    assert (s_, sq_, n_) == (exp["s"], int(exp["sq"]), exp["n"])
    # predicated: full + boundary groups, still exact — and since
    # round 8 the DV'd BOUNDARY groups scan live-only through the
    # exact reader instead of demoting the whole query to a full scan
    p = (col("v") >= 100) & (col("v") < 500)
    lp = (F.col("v") >= 100) & (F.col("v") < 500)
    assert t.count_rows(p) == live.filter(lp).count()
    assert t.last_count_pushdown is not None, \
        "DV'd boundary groups must not demote the count pushdown"
    sp, _ = t.sum_rows("v", p)
    assert sp == live.filter(lp).agg(F.sum("v")).head()[0]
    assert t.last_sum_pushdown is not None, \
        "DV'd boundary groups must not demote the sum pushdown"
    sv, sqv, nv = t.sum_sq_rows("v", p)
    lv = live.filter(lp)
    evar = lv.agg(F.sum("v").alias("s"),
                  F.sum(F.col("v").cast("decimal(38,0)") * F.col("v"))
                  .alias("sq"), F.count("v").alias("n")).head()
    assert (sv, sqv, nv) == (evar["s"], int(evar["sq"]), evar["n"])
    assert t.last_var_pushdown is not None


def test_unrepairable_catalog_answers_refuse(spark, dv_table):
    t, _ = dv_table
    t.delete_where(DEL)
    for call in (lambda: t.min_max("v"),
                 lambda: t.group_counts("v"),
                 lambda: t.heavy_hitters("v"),
                 lambda: t.ndv_estimate("v"),
                 lambda: t.hist_quantiles("v", [500])):
        with pytest.raises(ValueError, match="deletion vectors"):
            call()
    # count_upper_bound stays a valid over-approximation
    assert t.count_upper_bound() >= t.count_rows()


def test_rowgroups_mode_serves_dvs(spark, dv_table):
    """mode='rowgroups' (the exact ParquetAccessPlan path) anti-filters
    deleted positions inside the Python DataSource read — it matches
    the files-mode result on every shape: residual predicate (partial
    row-group coverage), full-file coverage, and projection."""
    t, base = dv_table
    ndel = t.delete_where(DEL)
    assert ndel > 0
    live = base.filter(LIVE())
    # partial coverage: a range predicate leaves boundary row groups
    p = (col("v") >= 100) & (col("v") < 500)
    lp = (F.col("v") >= 100) & (F.col("v") < 500)
    got = sorted((r["k"], r["v"])
                 for r in t.query(p, mode="rowgroups").collect())
    want = sorted((r["k"], r["v"])
                  for r in live.filter(lp).select("k", "v").collect())
    assert got == want
    assert got == sorted((r["k"], r["v"])
                         for r in t.query(p).collect())
    # full coverage (no predicate): the native half applies the
    # anti-join too
    assert t.query(None, mode="rowgroups").count() == live.count()
    # projection still prunes columns
    cols = t.query(p, columns=["k"], mode="rowgroups").columns
    assert cols == ["k"]


def test_update_where(spark, dv_table):
    """Merge-on-read UPDATE: new versions land as one file, old
    versions become deletion vectors; every read surface serves the
    updated values; idempotent when the assignment moves rows out of
    the predicate."""
    t, base = dv_table
    n0 = t.count_rows()
    # +1000001: shifts v % 10 from 3 to 4, so updated rows leave the
    # predicate (a +1000000 shift would keep them in it)
    n_upd = t.update_where(DEL, {"v": "v + 1000001"})
    assert n_upd == base.filter(~LIVE()).count() > 0
    assert t.count_rows() == n0                       # rows move, not vanish
    # updated rows serve the new value on every surface
    assert t.query((col("v") % 10) == 3).count() == 0
    got = t.query(col("v") >= 1_000_000).count()
    assert got == n_upd
    exp = base.withColumn(
        "v", F.when(~LIVE(), F.col("v") + 1_000_001).otherwise(F.col("v")))
    s, nn = t.sum_rows("v")
    want = exp.agg(F.sum("v").alias("s"), F.count("v").alias("n")).head()
    assert (s, nn) == (want["s"], want["n"])
    # a second identical update matches nothing (values moved out)
    assert t.update_where(DEL, {"v": "v + 1000001"}) == 0


def test_update_where_rejects_unknown_columns(spark, dv_table):
    t, _ = dv_table
    with pytest.raises(ValueError, match="not in the table schema"):
        t.update_where(DEL, {"nope": "1"})


def test_update_where_lands_before_deletes(spark, dv_table, monkeypatch):
    """Same failure ordering as merge_upsert: a crash in the delete
    step leaves the new versions landed and NO deletes committed —
    recoverable duplicates, never lost rows."""
    t, base = dv_table

    def exploding(*a, **kw):
        raise RuntimeError("crash during update delete step")

    # the delete seam of the single-pass UPDATE: DV commit from the
    # shared cached victim read
    monkeypatch.setattr(t, "_dv_store_victims", exploding)
    with pytest.raises(RuntimeError, match="crash during update"):
        t.update_where(DEL, {"v": "v + 1000000"})
    landed = [f for f in os.listdir(str(t.data_dir))
              if f.startswith("update_")]
    assert landed
    assert not t.catalog.get_dv_ranges()


def test_read_changes_delete_then_merge(spark, dv_table):
    """Change data feed: deletes surface as DV-delta rows, a merge as
    delete+insert pairs; unchanged rows never appear."""
    t, base = dv_table
    s0 = t.snapshot()
    ndel = t.delete_where(DEL)
    s1 = t.snapshot()
    # era transition s0 -> s1: exactly the deleted rows, as deletes
    ch = t.read_changes(s0, s1)
    by_type = {r["_change_type"]: r["n"] for r in
               ch.groupBy("_change_type").count()
               .withColumnRenamed("count", "n").collect()}
    assert by_type == {"delete": ndel}
    got_k = sorted(r["k"] for r in ch.collect())
    want_k = sorted(r["k"] for r in base.filter(~LIVE()).collect())
    assert got_k == want_k
    # merge: updates land as inserts, their old versions as deletes
    updates = spark.range(30).select(
        (F.col("id") * 2).cast("long").alias("k"),   # even keys, live
        F.lit(9_999_999).cast("long").alias("v"),
        F.md5(F.col("id").cast("string")).alias("pay"))
    n_del, n_ins = t.merge_upsert(updates, "k")
    s2 = t.snapshot()
    ch2 = t.read_changes(s1, s2)
    by_type = {r["_change_type"]: r["n"] for r in
               ch2.groupBy("_change_type").count()
               .withColumnRenamed("count", "n").collect()}
    assert by_type == {"delete": n_del, "insert": n_ins}
    ins_v = {r["v"] for r in
             ch2.filter(F.col("_change_type") == "insert").collect()}
    assert ins_v == {9_999_999}
    # cumulative feed s0 -> s2 = union of the two transitions
    ch_all = t.read_changes(s0, s2)
    assert ch_all.count() == ch.count() + ch2.count()
    # identical eras -> empty feed with the right schema
    empty = t.read_changes(s2, s2)
    assert empty.count() == 0
    assert empty.columns[0] == "_change_type"


def test_read_changes_fails_loudly_on_broken_eras(spark, dv_table):
    t, _ = dv_table
    s0 = t.snapshot()
    t.delete_where(DEL)
    s1 = t.snapshot()
    with pytest.raises(ValueError, match="since <= until"):
        t.read_changes(s1, s0)
    # compaction rewrites bytes -> the earlier eras are no longer
    # reconstructible; the feed must raise, never serve partially
    t.compact_deletes()
    with pytest.raises(ValueError):
        t.read_changes(s0, s1)
    # expired snapshot -> KeyError
    s2 = t.snapshot()
    s3 = t.snapshot()
    t.catalog.expire_snapshots(keep_last=1)
    with pytest.raises(KeyError, match="expired"):
        t.read_changes(s2, s3)


def test_expired_snapshot_with_dv_copy_fails_loudly(spark, dv_table):
    """Retention × DML: expire_snapshots drops the per-snapshot DV
    copies — an as-of read whose era relied on a recorded DV copy must
    then raise on EVERY surface, never silently serve the wrong era
    (e.g. the live DV state, or no deletions at all)."""
    t, base = dv_table
    t.delete_where(DEL)
    s1 = t.snapshot()           # era with its own DV copy
    t.delete_where(col("v") < 50)
    s2 = t.snapshot()
    n1 = base.filter(LIVE()).count()
    # sanity: before expiry the DV-backed era answers exactly
    assert t.query(None, as_of=s1).count() == n1
    assert t.count_rows(as_of=s1) == n1
    expired = t.catalog.expire_snapshots(keep_last=1)
    assert s1 in expired and s2 not in expired
    for call in (lambda: t.query(None, as_of=s1).count(),
                 lambda: t.query(None, mode="rowgroups",
                                 as_of=s1).count(),
                 lambda: t.count_rows(as_of=s1),
                 lambda: t.sum_rows("v", as_of=s1)):
        with pytest.raises(KeyError, match="expired"):
            call()
    # the surviving era still answers with ITS recorded deletions
    n2 = base.filter(LIVE()).filter(F.col("v") >= 50).count()
    assert t.query(None, as_of=s2).count() == n2
    assert t.count_rows(as_of=s2) == n2


def test_rowgroups_mode_serves_dvs_as_of(spark, dv_table):
    """Time travel through the exact path: each era's rowgroups read
    answers with its own recorded deletions."""
    t, base = dv_table
    s0 = t.snapshot()
    t.delete_where(DEL)
    s1 = t.snapshot()
    n0 = base.count()
    n1 = base.filter(LIVE()).count()
    assert t.query(None, mode="rowgroups", as_of=s0).count() == n0
    assert t.query(None, mode="rowgroups", as_of=s1).count() == n1


def test_order_limit_falls_back_and_is_exact(spark, dv_table):
    t, base = dv_table
    t.delete_where(DEL)
    live = base.filter(LIVE())
    got = [r["v"] for r in
           t.order_limit("v", 7, descending=True, tiebreak=["k"])
           .collect()]
    want = [r["v"] for r in
            live.orderBy(F.col("v").desc_nulls_last(),
                         F.col("k").asc_nulls_last()).limit(7).collect()]
    assert got == want


def test_snapshots_version_the_dv_state(spark, dv_table):
    """Snapshots COPY the DV state (Delta/Iceberg snapshot their delete
    files the same way): as-of reads serve with the recorded vectors —
    time travel stays exact under row-level DML, each era answering
    with its own deletions."""
    t, base = dv_table
    n0 = t.count_rows()
    snap0 = t.snapshot()                  # era 0: nothing deleted
    nd1 = t.delete_where(DEL)
    snap1 = t.snapshot()                  # era 1: DEL applied
    nd2 = t.delete_where((col("v") % 10) == 4)
    # live: both deletes; snap1: only DEL; snap0: none
    assert t.count_rows() == n0 - nd1 - nd2
    assert t.count_rows(as_of=snap1) == n0 - nd1
    assert t.count_rows(as_of=snap0) == n0
    assert t.query(None, as_of=snap0).count() == n0
    assert t.query(None, as_of=snap1).count() == n0 - nd1
    # as-of SUM folds with the era's recorded adjustments — exact
    live1 = base.filter(LIVE())
    s1, nn1 = t.sum_rows("v", as_of=snap1)
    exp1 = live1.agg(F.sum("v"), F.count("v")).head()
    assert (s1, nn1) == (exp1[0], exp1[1])
    assert t.last_sum_pushdown["partial_row_groups"] == 0
    s0, nn0 = t.sum_rows("v", as_of=snap0)
    exp0 = base.agg(F.sum("v"), F.count("v")).head()
    assert (s0, nn0) == (exp0[0], exp0[1])
    # era-correct rows, not just counts
    rows1 = sorted(r["v"] for r in
                   t.query((col("v") >= 100) & (col("v") < 130),
                           as_of=snap1).collect())
    want1 = sorted(r["v"] for r in live1.filter(
        (F.col("v") >= 100) & (F.col("v") < 130)).collect())
    assert rows1 == want1


def test_compaction_materializes_and_restores(spark, dv_table):
    t, base = dv_table
    t.delete_where(DEL)
    n_live = t.count_rows()
    s_live, _ = t.sum_rows("v")
    rewritten = t.compact_deletes()
    assert rewritten == 1  # only odd.parquet had deletions
    assert not t.catalog.get_dv_ranges()
    assert t.count_rows() == n_live
    s2, _ = t.sum_rows("v")
    assert s2 == s_live
    # catalog-only answers work again and match the live data
    lo, hi = t.min_max("v")[:2]
    live = base.filter(LIVE())
    assert lo == live.agg(F.min("v")).head()[0]
    # pruning still works over the rewritten file
    dec = t.plan_scan(col("k") == 1_001)
    assert dec.row_groups_scanned < dec.total_row_groups


def test_compaction_drops_fully_deleted_file(spark, tmp_path):
    d = str(tmp_path / "dvall")
    os.makedirs(d)
    df = spark.range(100).select(F.col("id").alias("k"))
    _one_file(df.filter(F.col("k") < 50), d, "a.parquet")
    _one_file(df.filter(F.col("k") >= 50), d, "b.parquet")
    t = IndexedParquetTable(spark, d, ["k"])
    t.delete_where(col("k") >= 50)      # everything in b.parquet
    assert t.count_rows() == 50
    t.compact_deletes()
    assert not os.path.exists(os.path.join(d, "b.parquet"))
    assert t.count_rows() == 50
    assert [f[0] for f in t.catalog.all_files()] == ["a.parquet"]


def test_merge_upsert(spark, dv_table):
    t, base = dv_table
    updates = spark.createDataFrame(
        [(2, 9999, "upd"), (3, 8888, "upd"), (4_001, 7777, "new")],
        "k LONG, v LONG, pay STRING")
    n_del, n_ins = t.merge_upsert(updates, "k")
    assert (n_del, n_ins) == (2, 3)     # k=2,3 existed; 4001 is new
    assert t.count_rows() == 4_000 - 2 + 3
    rows = {r["k"]: r["v"] for r in
            t.query(col("k").isin([2, 3, 4_001])).collect()}
    assert rows == {2: 9999, 3: 8888, 4_001: 7777}
    # the landed file is indexed: a point query prunes to it
    dec = t.plan_scan(col("v") == 7777)
    assert list(dec.files_scanned) == ["upsert_000000.parquet"]


def test_refresh_clears_dv_on_rewritten_file(spark, dv_table):
    t, base = dv_table
    t.delete_where(DEL)
    assert t.catalog.get_dv_ranges()
    # odd.parquet is rewritten externally (immutable-file convention
    # violated deliberately): its positions are meaningless, the
    # upsert drops its DV with the old bytes
    d = t.data_dir
    _one_file(base.filter(F.col("k") % 2 == 1).orderBy(F.desc("k")),
              d, "odd.parquet", block=1 << 20)
    t.refresh()
    assert "odd.parquet" not in t.catalog.get_dv_ranges()
    assert t.count_rows() == 4_000  # rewrite resurrected the rows


def test_decimal_sum_column_adjusts_exactly(spark, tmp_path):
    d = str(tmp_path / "dvdec")
    os.makedirs(d)
    df = spark.range(1_000).select(
        F.col("id").alias("k"),
        (F.col("id").cast("decimal(12,2)") / 4).alias("price"))
    _one_file(df, d, "p.parquet")
    t = IndexedParquetTable(spark, d, ["k", "price"],
                            sum_columns=["price"])
    t.delete_where((col("k") % 5) == 0)
    live = df.filter(~((F.col("k") % 5) == 0))
    s, n = t.sum_rows("price")
    exp = live.agg(F.sum("price").alias("s"),
                   F.count("price").alias("n")).head()
    assert t.last_sum_pushdown["partial_row_groups"] == 0
    assert (s, n) == (exp["s"], exp["n"])


def test_read_delta_applies_dvs(spark, dv_table):
    t, base = dv_table
    s1 = t.snapshot()
    d = t.data_dir
    _one_file(base.filter(F.col("k") % 2 == 1)
              .withColumn("k", F.col("k") + 10_000), d, "late.parquet")
    t.refresh()
    t.delete_where(col("k") == 10_001)   # one row of the arrival
    n_added = t.read_delta(s1).count()
    assert n_added == 2_000 - 1          # the delta read is DV-filtered


def test_delete_matching_semi_join(spark, dv_table):
    t, base = dv_table
    victims = spark.range(100).select(
        (F.col("id") * 3).alias("k"))        # k in {0,3,...,297}
    n = t.delete_matching(victims, "k")
    assert n == 100
    assert t.count_rows() == 4_000 - 100
    # idempotent: the located rows are already invisible
    assert t.delete_matching(victims, "k") == 0
    # NULL victim keys never match
    nulls = spark.createDataFrame([(None,)], "k LONG")
    assert t.delete_matching(nulls, "k") == 0
    # sum arithmetic stays exact under the set delete
    live = base.filter(~((F.col("k") % 3 == 0) & (F.col("k") < 300)))
    s, nn = t.sum_rows("v")
    exp = live.agg(F.sum("v"), F.count("v")).head()
    assert (s, nn) == (exp[0], exp[1])
    assert t.last_sum_pushdown["partial_row_groups"] == 0


def test_delete_matching_prunes_to_key_window(spark, dv_table):
    t, _ = dv_table
    # victims all in the low-key range: the even/odd files both span
    # it, but the scan must still be pruned by the [min,max] window
    victims = spark.createDataFrame([(5,), (6,)], "k LONG")
    n = t.delete_matching(victims, "k")
    assert n == 2
    dec = t.last_scan  # the window plan_scan is the last decision
    assert dec.row_groups_scanned < dec.total_row_groups


def test_partitioned_layout_deletes(spark, tmp_path):
    """DVs on a hive-partitioned layout: the file key is the
    dir-relative path (basenames repeat across partition dirs), reads
    surface partition columns via basePath, and delete/query/count/sum
    /compact all hold. The 100 TB norm is partitioned, so the DML
    surface must not be flat-only."""
    d = str(tmp_path / "dvpart")
    df = spark.range(2_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("p"),
        (F.col("id") * 3 % 100).alias("v"))
    (df.repartition(1).write.partitionBy("p")
     .mode("overwrite").parquet(d))
    t = IndexedParquetTable(spark, d, index_columns=["k", "v"],
                            sum_columns=["v"])
    assert t.partitioned

    # delete a slice touching every partition dir
    ndel = t.delete_where((col("v") % 10) == 1)
    live = df.filter(~((F.col("v") % 10) == 1))
    assert ndel == 2_000 - live.count() > 0

    # mixed partition + data predicate, DV-filtered
    got = sorted(r["k"] for r in t.query(
        (col("p") == 2) & (col("v") < 50)).collect())
    want = sorted(r["k"] for r in live.filter(
        (F.col("p") == 2) & (F.col("v") < 50)).collect())
    assert got == want

    # counts/sums (partitioned falls back to the DV-filtered scan)
    assert t.count_rows() == live.count()
    s, nn = t.sum_rows("v")
    exp = live.agg(F.sum("v"), F.count("v")).head()
    assert (s, nn) == (exp[0], exp[1])

    # set-based delete on a partitioned layout
    n2 = t.delete_matching(
        spark.createDataFrame([(7,), (8,)], "k LONG"), "k")
    assert 0 <= n2 <= 2
    live2_n = live.filter(~F.col("k").isin([7, 8])).count()
    assert t.count_rows() == live2_n

    # compaction rewrites only the DV'd files, in place, per dir
    t.compact_deletes()
    assert not t.catalog.get_dv_ranges()
    assert t.count_rows() == live2_n
    got2 = sorted(r["k"] for r in t.query(
        (col("p") == 2) & (col("v") < 50)).collect())
    want2 = sorted(r["k"] for r in live.filter(
        (F.col("p") == 2) & (F.col("v") < 50)
        & ~F.col("k").isin([7, 8])).collect())
    assert got2 == want2


def test_partitioned_merge_and_update(spark, tmp_path):
    """Round 8: merge_upsert and update_where land partition-aware on
    hive layouts (one file per touched partition dir) instead of
    refusing; an UPDATE that changes a partition column moves the rows
    into their new partition directories."""
    d = str(tmp_path / "dvpartdml")
    df = spark.range(2_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("p"),
        (F.col("id") * 3 % 100).alias("v"))
    (df.repartition(1).write.partitionBy("p")
     .mode("overwrite").parquet(d))
    t = IndexedParquetTable(spark, d, index_columns=["k", "v"],
                            sum_columns=["v"])
    assert t.partitioned

    # MERGE: bump v for 40 keys spanning all 4 partitions
    updates = df.filter(F.col("k") < 40).withColumn(
        "v", F.col("v") + 1000)
    n_del, n_ins = t.merge_upsert(updates, "k")
    assert (n_del, n_ins) == (40, 40)
    assert t.count_rows() == 2_000
    got = {r["k"]: (r["p"], r["v"]) for r in
           t.query(col("k") < 40).collect()}
    want = {r["k"]: (r["p"], r["v"] + 1000) for r in
            df.filter(F.col("k") < 40).collect()}
    assert got == want
    # the upserts landed inside their partition dirs
    import glob
    landed = glob.glob(os.path.join(d, "p=*", "upsert_*.parquet"))
    assert len(landed) == 4, landed

    # UPDATE that MOVES rows across partitions: p -> p + 10 for k < 10
    n_upd = t.update_where(col("k") < 10, {"p": "p + 10"})
    assert n_upd == 10
    assert t.count_rows() == 2_000
    moved = t.query(col("p") >= 10)
    assert sorted(r["k"] for r in moved.collect()) == list(range(10))
    assert glob.glob(os.path.join(d, "p=1[0-3]", "update_*.parquet"))
    # old partitions no longer serve the moved keys
    assert t.query((col("p") < 10) & (col("k") < 10)).count() == 0


def test_dv_matching_survives_uri_hostile_paths(spark, tmp_path):
    """Spark renders _metadata.file_path through java.net.URI (space ->
    %20, %% -> %25 on top of hive's own %%25 dir escaping; '+' stays
    raw), so DV matching happens in URI space: catalog keys are quoted
    with the same character set before the join and unquoted after the
    victim collection. A raw string comparison silently no-ops the
    anti-join and serves deleted rows — this pins the hostile cases."""
    d = str(tmp_path / "dv space dir")
    df = spark.createDataFrame(
        [(i, ["New York", "a+b", "x%y", "plain"][i % 4], i * 7 % 50)
         for i in range(400)], "k LONG, p STRING, v LONG")
    df.repartition(1).write.partitionBy("p").mode("overwrite").parquet(d)
    t = IndexedParquetTable(spark, d, index_columns=["k", "v"])
    assert t.partitioned
    ndel = t.delete_where((col("v") % 5) == 2)
    live = df.filter(~((F.col("v") % 5) == 2))
    assert ndel == 400 - live.count() > 0
    # every partition dir must actually anti-filter (the silent-no-op
    # failure mode leaves counts unchanged)
    for pv in ["New York", "a+b", "x%y", "plain"]:
        got = t.query(col("p") == pv).count()
        want = live.filter(F.col("p") == pv).count()
        assert got == want, (pv, got, want)
    assert t.count_rows() == live.count()
    # the delete itself stored catalog-space keys: compact resolves them
    t.compact_deletes()
    assert not t.catalog.get_dv_ranges()
    assert t.count_rows() == live.count()


def test_views_track_dml(spark, dv_table):
    """A temp view pins its plan at registration; DML mutations must
    re-register the table's views or a pre-delete view would keep
    serving deleted rows, contradicting the every-read-surface
    contract."""
    t, base = dv_table
    t.create_temp_view("dv_live_view")
    n0 = spark.sql("SELECT COUNT(*) c FROM dv_live_view").head()["c"]
    ndel = t.delete_where(DEL)
    assert spark.sql("SELECT COUNT(*) c FROM dv_live_view").head()["c"] \
        == n0 - ndel
    n2 = t.delete_matching(
        spark.createDataFrame([(2,), (4,)], "k LONG"), "k")
    assert spark.sql("SELECT COUNT(*) c FROM dv_live_view").head()["c"] \
        == n0 - ndel - n2
    t.compact_deletes()
    assert spark.sql("SELECT COUNT(*) c FROM dv_live_view").head()["c"] \
        == n0 - ndel - n2


def test_range_subtract_fuzz():
    """Pure-python fuzz of the change-feed range subtraction: for
    random position sets, subtracting compressed ranges must equal
    subtracting the exploded sets — both for the DV-growth case
    (old ⊆ new) and the general case."""
    import random

    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable as T,
    )

    def explode(rs):
        out = set()
        for a, ln in rs:
            out.update(range(a, a + ln))
        return out

    def compress(pos):
        pos = sorted(pos)
        out = []
        for p in pos:
            if out and out[-1][0] + out[-1][1] == p:
                out[-1][1] += 1
            else:
                out.append([p, 1])
        return [tuple(x) for x in out]

    rng = random.Random(7)
    for trial in range(2_000):
        old_pos = set(rng.sample(range(60), rng.randint(0, 25)))
        extra = set(rng.sample(range(60), rng.randint(0, 25)))
        new_pos = old_pos | extra
        got = T._range_subtract(compress(new_pos), compress(old_pos))
        assert got == compress(new_pos - old_pos), trial
        got2 = T._range_subtract(compress(extra), compress(old_pos))
        assert explode(got2) == (extra - old_pos), trial


def test_compact_small_files_packs_and_preserves(spark, tmp_path):
    """OPTIMIZE: small files bin-pack into one per directory; counts,
    sums, and pruning survive; DV'd files are skipped until their
    deletes are materialized."""
    d = str(tmp_path / "optimize")
    os.makedirs(d)
    base = spark.range(3_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 7 % 1000).cast("long").alias("v"))
    for i in range(6):
        _one_file(base.filter(F.col("k") % 6 == i).orderBy("k"),
                  d, f"part{i}.parquet")
    t = IndexedParquetTable(spark, d, ["k", "v"], sum_columns=["v"])
    n0, (s0, _) = t.count_rows(), t.sum_rows("v")
    # a DV'd file is skipped: delete some rows first, don't compact
    t.delete_where(col("k") < 10)
    live_n = t.count_rows()
    packed = t.compact_small_files(target_bytes=1 << 30)
    assert packed == 0 or t.catalog.get_dv_ranges(), \
        "files with DVs must not pack"
    # materialize deletes, then pack everything into one file
    t.compact_deletes()
    packed = t.compact_small_files(target_bytes=1 << 30)
    assert packed == 1
    files = [f[0] for f in t.catalog.all_files()]
    assert files == ["pack_000000.parquet"], files
    assert t.count_rows() == live_n
    got = sorted(r["k"] for r in t.query(
        (col("v") >= 100) & (col("v") < 200)).collect())
    want = sorted(r["k"] for r in base.filter(
        (F.col("k") >= 10) & (F.col("v") >= 100)
        & (F.col("v") < 200)).collect())
    assert got == want
    # idempotent: one big file, nothing left to pack
    assert t.compact_small_files(target_bytes=1 << 30) == 0


def test_compact_small_files_crash_recovery(spark, tmp_path,
                                            monkeypatch):
    """Both crash states heal without duplicate or lost rows:
    (a) packed landed, no sources removed -> recovery drops the packed
    copy; (b) packed landed, removals half done -> recovery finishes
    them and the packed file serves every row."""
    d = str(tmp_path / "optcrash")
    os.makedirs(d)
    base = spark.range(1_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 100).cast("long").alias("v"))
    for i in range(4):
        _one_file(base.filter(F.col("k") % 4 == i).orderBy("k"),
                  d, f"part{i}.parquet")
    t = IndexedParquetTable(spark, d, ["k", "v"], sum_columns=["v"])
    n0 = t.count_rows()

    # state (a): craft packed + marker with ALL sources intact
    import json as _json
    import shutil as _sh
    _sh.copy(os.path.join(d, "part0.parquet"),
             os.path.join(d, "pack_000000.parquet"))
    with open(os.path.join(d, ".pack_000000.parquet.pack.intent"),
              "w") as fh:
        _json.dump({"sources": ["part0.parquet", "part1.parquet"]}, fh)
    t2 = IndexedParquetTable(spark, d, ["k", "v"], sum_columns=["v"])
    assert not os.path.exists(os.path.join(d, "pack_000000.parquet"))
    assert t2.count_rows() == n0

    # state (b): real pack crashing after the first source removal
    calls = {"n": 0}
    real_remove = t2.catalog.remove_file

    def exploding_remove(fname):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("crash mid-pack")
        return real_remove(fname)

    monkeypatch.setattr(t2.catalog, "remove_file", exploding_remove)
    with pytest.raises(RuntimeError, match="crash mid-pack"):
        t2.compact_small_files(target_bytes=1 << 30)
    monkeypatch.setattr(t2.catalog, "remove_file", real_remove)
    # fresh session: recovery finishes the removals; every row served
    t3 = IndexedParquetTable(spark, d, ["k", "v"], sum_columns=["v"])
    assert t3.count_rows() == n0
    assert t3.to_df().count() == n0
    files = [f[0] for f in t3.catalog.all_files()]
    assert any(f.startswith("pack_") for f in files), files


def test_update_where_assignments_see_original_row(spark, dv_table):
    """SQL UPDATE semantics: every assignment RHS evaluates against the
    PRE-update row, so SET k = v, v = k swaps (a sequential column
    rewrite would corrupt one side)."""
    t, base = dv_table
    victims = {r["k"]: r["v"] for r in
               base.filter(~LIVE()).select("k", "v").collect()}
    n_upd = t.update_where(DEL, {"k": "v", "v": "k"})
    assert n_upd == len(victims) > 0
    # final table = untouched rows + swapped (k=old v, v=old k) rows
    got = sorted((r["k"], r["v"])
                 for r in t.to_df().select("k", "v").collect())
    untouched = [(r["k"], r["v"]) for r in
                 base.filter(LIVE()).select("k", "v").collect()]
    want = sorted(untouched + [(v, k) for k, v in victims.items()])
    assert got == want


def test_sum_adjustments_invalidated_by_uncovered_deletes(
        spark, tmp_path):
    """A second delete recorded WITHOUT sum adjustments (different /
    empty sum_columns against the same persisted catalog) must
    invalidate the group's existing adjustments — the pushdown demotes
    instead of under-subtracting only the first delete's rows."""
    from datafusion_async_parquet_index_spark.sources.catalog import (
        SqliteIndexCatalog,
    )
    d = str(tmp_path / "dvcover")
    os.makedirs(d)
    base = spark.range(4_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 7 % 1000).cast("long").alias("v"))
    _one_file(base.orderBy("k"), d, "a.parquet")
    db = str(tmp_path / "cat.sqlite")
    t1 = IndexedParquetTable(spark, d, ["k", "v"], sum_columns=["v"],
                             catalog=SqliteIndexCatalog(db))
    t1.delete_where((col("v") % 10) == 3)      # adjustments recorded
    assert t1.catalog.dv_sum_adjustments("v")
    # session with NO sum_columns deletes MORE rows in the same groups
    t2 = IndexedParquetTable(spark, d, ["k", "v"],
                             catalog=SqliteIndexCatalog(db))
    assert t2.delete_where((col("v") % 10) == 7) > 0
    assert not t2.catalog.dv_sum_adjustments("v"), \
        "uncovered deletions must invalidate the stale adjustments"
    # session 3 reopens with sums: must demote, never under-subtract
    t3 = IndexedParquetTable(spark, d, ["k", "v"], sum_columns=["v"],
                             catalog=SqliteIndexCatalog(db))
    live = base.filter(~((F.col("v") % 10) == 3)
                       & ~((F.col("v") % 10) == 7))
    exp = live.agg(F.sum("v").alias("s"), F.count("v").alias("n"),
                   F.sum(F.col("v").cast("decimal(38,0)") * F.col("v"))
                   .alias("sq")).head()
    assert t3.sum_rows("v") == (exp["s"], exp["n"])
    s_, sq_, n_ = t3.sum_sq_rows("v")
    assert (s_, sq_, n_) == (exp["s"], int(exp["sq"]), exp["n"])
