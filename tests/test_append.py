"""The public INSERT verb (``IndexedParquetTable.append``) — VERDICT
r9 ask #4: the DML set had DELETE/UPDATE/MERGE/OPTIMIZE/RESTORE/CDF
but plain ingest only as "write externally, then refresh()". These pin:

- append lands + indexes the batch, returns the exact row count, and
  every catalog surface (COUNT/SUM pushdowns, change feed, snapshots)
  sees it;
- column realignment (any input order) and the loud schema-mismatch
  refusal before anything lands;
- empty batches land nothing;
- hive layouts land partition-aware;
- the CLI spelling.
"""

import os

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


def test_append_lands_and_indexes(spark, tmp_path):
    d = str(tmp_path / "app")
    _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"], sum_columns=["v"])
    n0 = t.count_rows()
    s0 = t.snapshot()
    batch = spark.range(50).select(
        (F.col("id") + 10_000).cast("long").alias("k"),
        F.lit(7).cast("long").alias("v"))
    assert t.append(batch) == 50
    # count + sum fold purely from the catalog, batch included
    assert t.count_rows() == n0 + 50
    s, nn = t.sum_rows("v")
    assert nn == n0 + 50 and t.last_sum_pushdown["partial_row_groups"] == 0
    # pruning reaches the new file: k >= 10000 scans ONLY it
    t.query(col("k") >= 10_000).collect()
    assert all(f.startswith("insert_")
               for f in t.last_scan.files_scanned)
    # the change feed shows exactly the appended rows as inserts
    s1 = t.snapshot()
    feed = t.read_changes(s0, s1)
    rows = feed.groupBy("_change_type").agg(
        F.count(F.lit(1)).alias("n")).collect()
    assert [(r["_change_type"], r["n"]) for r in rows] == [("insert", 50)]
    # as-of s0 still answers without the batch
    assert t.count_rows(as_of=s0) == n0


def test_append_realigns_columns(spark, tmp_path):
    d = str(tmp_path / "app_order")
    _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    batch = spark.createDataFrame([(99, 20_000)], "v LONG, k LONG")
    assert t.append(batch) == 1
    got = t.query(col("k") == 20_000).collect()
    assert [(r["k"], r["v"]) for r in got] == [(20_000, 99)]


def test_append_schema_mismatch_refuses(spark, tmp_path):
    d = str(tmp_path / "app_bad")
    _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    files_before = {f[0] for f in t.catalog.all_files()}
    with pytest.raises(ValueError, match="missing \\['v'\\]"):
        t.append(spark.range(3).select(
            F.col("id").alias("k"), F.col("id").alias("w")))
    assert {f[0] for f in t.catalog.all_files()} == files_before
    assert not [f for f in os.listdir(d) if f.startswith("insert_")]


@pytest.mark.parametrize("backend", ["sqlite", "df"])
def test_append_merge_schema_evolves(spark, tmp_path, backend):
    """r10 VERDICT ask #4: merge_schema=True lands a superset-schema
    batch, evolves the table schema (new column nullable), pre-
    evolution files read NULL and are pruned by predicates on the
    evolved indexed column (the q72 PROVEN-all-null machinery), and
    COUNT/SUM pushdowns keep folding."""
    d = str(tmp_path / f"app_evo_{backend}")
    _corpus(spark, d)
    kw = {}
    if backend == "df":
        from datafusion_async_parquet_index_spark.sources.df_catalog import (
            DataFrameIndexCatalog,
        )
        kw["catalog"] = DataFrameIndexCatalog(spark)
    t = IndexedParquetTable(spark, d, ["k", "v", "w"],
                            sum_columns=["v"], **kw)
    n0 = t.count_rows()
    batch = spark.range(40).select(
        (F.col("id") + 20_000).cast("long").alias("k"),
        F.lit(3).cast("long").alias("v"),
        (F.col("id") * 5).cast("long").alias("w"))
    # default refuses with the evolve hint
    with pytest.raises(ValueError, match="merge_schema=True"):
        t.append(batch)
    assert t.append(batch, merge_schema=True) == 40
    # schema evolved: w present, nullable
    wf = {f.name: f for f in t._schema.fields}["w"]
    assert wf.nullable
    # pre-evolution rows read w as NULL; totals fold
    assert t.count_rows() == n0 + 40
    assert t.count_rows(col("w").is_null()) == n0
    s, nn = t.sum_rows("v")
    assert nn == n0 + 40
    # a predicate on the evolved indexed column prunes the entire
    # pre-evolution era from the catalog alone
    got = t.query(col("w") >= 100)
    rows = got.collect()
    assert {f for f in t.last_scan.files_scanned} \
        & {"a.parquet", "b.parquet"} == set()
    assert len(rows) == sum(1 for i in range(40) if i * 5 >= 100)
    assert all(r["v"] == 3 for r in rows)
    # a FRESH handle over the evolved directory unions footers
    t2 = IndexedParquetTable(spark, d, ["k", "v"], merge_schema=True,
                             **({} if backend == "sqlite" else kw))
    assert "w" in [f.name for f in t2._schema.fields]
    assert t2.count_rows() == n0 + 40


def test_append_widens_int_batch_to_long_table(spark, tmp_path):
    """A batch with int columns into a long table lands via the
    lossless cast; reads, predicates, and SUM pushdown all keep
    working on the homogeneous landed file."""
    d = str(tmp_path / "app_widen")
    _corpus(spark, d)   # long k, long v
    t = IndexedParquetTable(spark, d, ["k", "v"], sum_columns=["v"])
    n0 = t.count_rows()
    batch = spark.range(5).select(
        (F.col("id") + 30_000).cast("int").alias("k"),
        F.lit(3).cast("int").alias("v"))
    assert t.append(batch) == 5
    got = t.query(col("k") >= 30_000).collect()
    assert len(got) == 5 and all(r["v"] == 3 for r in got)
    s, nn = t.sum_rows("v")
    assert nn == n0 + 5


def test_append_refuses_narrowing_type(spark, tmp_path):
    """A LONG batch into an INT table must refuse BEFORE landing — a
    landed int64 file under an int32 table schema fails every
    subsequent vectorized read of the whole table."""
    d = str(tmp_path / "app_narrow")
    os.makedirs(d, exist_ok=True)
    base = spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 10).cast("int").alias("v"))
    _one_file(base, d, "a.parquet")
    t = IndexedParquetTable(spark, d, ["k", "v"])
    bad = spark.range(2).select(
        (F.col("id") + 3_000_000_000).alias("k"),     # long
        F.lit(3).cast("long").alias("v"))
    with pytest.raises(ValueError, match="lossless numeric widenings"):
        t.append(bad)
    assert not [f for f in os.listdir(d) if f.startswith("insert_")]
    # the table still reads fine
    assert t.count_rows() == 100
    assert t.query(col("k") >= 0).count() == 100
    # merge_upsert shares the contract
    with pytest.raises(ValueError, match="lossless numeric widenings"):
        t.merge_upsert(bad, "k")
    assert not [f for f in os.listdir(d) if f.startswith("upsert_")]


def test_append_merge_schema_still_refuses_missing(spark, tmp_path):
    """Evolution only ADDS columns: a batch missing a table column
    refuses even with merge_schema=True."""
    d = str(tmp_path / "app_evo_miss")
    _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    bad = spark.range(3).select(
        F.col("id").alias("k"), F.col("id").alias("w"))
    with pytest.raises(ValueError, match="missing \\['v'\\]"):
        t.append(bad, merge_schema=True)
    assert not [f for f in os.listdir(d) if f.startswith("insert_")]


def test_append_empty_batch_noop(spark, tmp_path):
    d = str(tmp_path / "app_empty")
    _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    n0 = t.count_rows()
    assert t.append(spark.range(0).select(
        F.col("id").alias("k"), F.col("id").alias("v"))) == 0
    assert t.count_rows() == n0
    assert not [f for f in os.listdir(d) if f.startswith("insert_")]


def test_append_partitioned_lands_per_partition(spark, tmp_path):
    d = str(tmp_path / "app_hive")
    base = spark.range(200).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 3).cast("long").alias("p"))
    base.write.partitionBy("p").mode("overwrite").parquet(d)
    for junk in os.listdir(d):          # _SUCCESS etc stay invisible
        if junk.startswith("_"):
            os.remove(os.path.join(d, junk))
    t = IndexedParquetTable(spark, d, ["k"], partitioned=True)
    n0 = t.count_rows()
    batch = spark.createDataFrame(
        [(1_000, 0), (1_001, 2)], "k LONG, p LONG")
    assert t.append(batch) == 2
    assert t.count_rows() == n0 + 2
    # each row landed inside its partition directory
    landed = [f[0] for f in t.catalog.all_files()
              if os.path.basename(f[0]).startswith("insert_")]
    assert sorted(os.path.dirname(f) for f in landed) == ["p=0", "p=2"]
    # partition pruning reaches the landed files
    t.query((col("p") == 2) & (col("k") >= 1_000)).collect()
    assert list(t.last_scan.files_scanned) == [landed[1]]


def test_cli_append(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    from datafusion_async_parquet_index_spark import cli
    d = str(tmp_path / "cli_app")
    _corpus(spark, d)
    db = str(tmp_path / "cat.db")
    src = str(tmp_path / "incoming")
    spark.range(25).select(
        (F.col("id") + 5_000).cast("long").alias("k"),
        F.lit(1).cast("long").alias("v")).write.parquet(src)

    rc = cli.main(["build", d, "--columns", "k,v", "--catalog", db])
    out = capsys.readouterr().out
    assert rc == 0 and "indexed 2 files" in out
    rc = cli.main(["append", d, "--columns", "k,v", src,
                   "--catalog", db])
    out = capsys.readouterr().out
    assert rc == 0 and "appended 25 rows" in out and "3 files" in out
    # without a file catalog the verb refuses before starting Spark
    assert cli.main(["append", d, "--columns", "k,v", src]) == 2


def test_cli_append_merge_schema(spark, tmp_path, capsys, monkeypatch):
    """--merge-schema evolves through the CLI; without it the extra
    column refuses with the evolve hint."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    from datafusion_async_parquet_index_spark import cli
    d = str(tmp_path / "cli_evo")
    _corpus(spark, d)
    db = str(tmp_path / "cat_evo.db")
    src = str(tmp_path / "incoming_evo")
    spark.range(10).select(
        (F.col("id") + 9_000).cast("long").alias("k"),
        F.lit(1).cast("long").alias("v"),
        (F.col("id") * 2).cast("long").alias("w")).write.parquet(src)
    assert cli.main(["build", d, "--columns", "k,v",
                     "--catalog", db]) == 0
    capsys.readouterr()
    with pytest.raises(ValueError, match="merge_schema=True"):
        cli.main(["append", d, "--columns", "k,v", src,
                  "--catalog", db])
    rc = cli.main(["append", d, "--columns", "k,v", src,
                   "--catalog", db, "--merge-schema"])
    out = capsys.readouterr().out
    assert rc == 0 and "appended 10 rows" in out
    from datafusion_async_parquet_index_spark.sources.catalog import (
        SqliteIndexCatalog,
    )
    t = IndexedParquetTable(spark, d, ["k", "v"], merge_schema=True,
                            catalog=SqliteIndexCatalog(db))
    assert "w" in [f.name for f in t._schema.fields]
    assert t.count_rows(col("w").is_null()) == 1_000


def test_append_parallel_multi_file_ingest(spark, tmp_path):
    """target_files=None: a large ingest keeps its natural
    partitioning — every shuffle partition writes in parallel, landing
    multiple uniquely-named files, all indexed, totals exact."""
    d = str(tmp_path / "app_par")
    _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    n0 = t.count_rows()
    batch = (spark.range(4_000).repartition(4)
             .select((F.col("id") + 50_000).cast("long").alias("k"),
                     F.lit(3).cast("long").alias("v")))
    assert t.append(batch, target_files=None) == 4_000
    landed = [f[0] for f in t.catalog.all_files()
              if f[0].startswith("insert_")]
    assert len(landed) == 4          # one file per shuffle partition
    assert t.count_rows() == n0 + 4_000
    got = t.query(col("k") >= 50_000)
    assert got.count() == 4_000
