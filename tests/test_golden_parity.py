"""End-to-end parity with the reference's golden run
(BASELINE.md / sqlx-sqlite/README.md:16-71): the five demo queries must
produce both the documented RESULTS and the documented PRUNING DECISIONS
(files + row groups scanned) on the ported demo corpus.
"""

import pytest

from datafusion_async_parquet_index_spark import IndexedParquetTable, col
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def table(spark, demo_dir):
    return IndexedParquetTable(spark, demo_dir, index_columns=["value", "text"])


def scanned(table):
    d = table.last_scan
    return {f: rgs for f, rgs in d.files_scanned.items()}, d.row_groups_scanned


def test_corpus_shape(table):
    files = table.catalog.all_files()
    assert [(f, rgc, rc) for f, _, rgc, rc in files] == [
        ("file1.parquet", 2, 100),
        ("file2.parquet", 2, 100),
        ("file3.parquet", 56, 2800),
    ]


def test_q1_select_limit_no_pruning(table):
    # Q1: SELECT file_name, value LIMIT 10 — no predicate, 3 files / 60 rgs
    df = table.query(None, columns=["file_name", "value"]).limit(10)
    assert df.count() == 10
    files, rgs = scanned(table)
    assert sorted(files) == ["file1.parquet", "file2.parquet", "file3.parquet"]
    assert rgs == 60


@pytest.mark.parametrize("mode", ["files", "rowgroups"])
def test_q2_point_equality(table, mode):
    # Q2: WHERE value = 150 — 1 file / 1 rg, result (file2.parquet, 150)
    df = table.query(col("value") == 150, columns=["file_name", "value"], mode=mode)
    rows = [(r.file_name, r.value) for r in df.collect()]
    assert rows == [("file2.parquet", 150)]
    files, rgs = scanned(table)
    assert files == {"file2.parquet": [1]}  # values 150..199 = rg1
    assert rgs == 1


@pytest.mark.parametrize("mode", ["files", "rowgroups"])
def test_q3_or_range_count_group_by(table, mode):
    # Q3: WHERE value < 20 OR value > 500, count(value) GROUP BY file_name
    # — 2 files / 51 rgs (file1: 1 of 2, file3: 50 of 56), file1=20 file3=2499
    df = (
        table.query((col("value") < 20) | (col("value") > 500), mode=mode)
        .groupBy("file_name").agg(F.count("value").alias("count_value"))
    )
    rows = {r.file_name: r.count_value for r in df.collect()}
    assert rows == {"file1.parquet": 20, "file3.parquet": 2499}
    files, rgs = scanned(table)
    assert sorted(files) == ["file1.parquet", "file3.parquet"]
    assert files["file1.parquet"] == [0]
    assert files["file3.parquet"] == list(range(6, 56))  # values 501.. start in rg6
    assert rgs == 51


@pytest.mark.parametrize("mode", ["files", "rowgroups"])
def test_q4_and_across_columns(table, mode):
    # Q4: WHERE value < 20 AND text = 'a' — 1 file / 1 rg, one row
    df = table.query((col("value") < 20) & (col("text") == "a"), mode=mode)
    rows = [(r.file_name, r.value, r.text) for r in df.collect()]
    assert rows == [("file1.parquet", 1, "a")]
    files, rgs = scanned(table)
    assert files == {"file1.parquet": [0]}
    assert rgs == 1


def test_q5_contradictory_and_no_io(table):
    # Q5: WHERE value > 500 AND text = 'a' — 0 files / 0 rgs, empty result:
    # answered from the index alone, no Parquet I/O
    df = table.query((col("value") > 500) & (col("text") == "a"))
    assert df.count() == 0
    files, rgs = scanned(table)
    assert files == {}
    assert rgs == 0


def test_isnull_pruned_no_io(table):
    """IS NULL on a column whose every row group records null_count = 0
    is refuted entirely from the catalog: like Q5, the access plan is
    empty and the query never touches Parquet — the NULL dimension of
    the stats schema doing the same zero-I/O trick min/max does for the
    contradictory range."""
    df = table.query(col("value").is_null())
    assert df.count() == 0
    files, rgs = scanned(table)
    assert files == {}
    assert rgs == 0


def test_incremental_reindex_is_idempotent(table):
    before = table.catalog.all_files()
    table.refresh()
    assert table.catalog.all_files() == before
    # and pruning still works after refresh
    df = table.query(col("value") == 150)
    assert df.count() == 1


def test_case_pruning_trace(table):
    """Literal-armed CASE prunes like its arm condition (the reference
    translates CASE into catalog SQL, conversions.rs:73-81): value <= 50
    reaches only file1's two row groups [0..49], [50..99]; file2/file3
    are refuted. The residual filter still applies the exact CASE."""
    from datafusion_async_parquet_index_spark.plans.expr import Case, Lit

    pred = Case([(col("value") <= 50, Lit(1))], Lit(0)) == 1
    df = table.query(pred)
    rows = sorted(r["value"] for r in df.collect())
    assert rows == list(range(0, 51))
    files, rgs = scanned(table)
    assert set(files) == {"file1.parquet"}
    assert files["file1.parquet"] == [0, 1]
    assert rgs == 2


def test_in_list_pruning_trace(table):
    """IN-list pruning through min/max: values {10, 150} touch exactly
    file1 rg0 (0..49) and file2 rg1 (100..149? no — 150 lands in
    file2's second row group [150..199]'s min) — assert the engine
    scans precisely the row groups whose range brackets a list value
    and nothing else, and returns exactly the two rows."""
    df = table.query(col("value").isin(10, 150))
    vals = sorted(r["value"] for r in df.collect())
    assert vals == [10, 150]
    files, rgs = scanned(table)
    assert set(files) == {"file1.parquet", "file2.parquet"}
    assert rgs == 2


def test_demo_main_runs(spark, demo_dir, capsys):
    """`python -m datafusion_async_parquet_index_spark` is the twin of
    the reference's demo binary (cargo run, main.rs:119-190). Drive its
    main() against the shared corpus and assert the golden pruning
    traces appear in the output."""
    import datafusion_async_parquet_index_spark.__main__ as demo

    rc = demo.main(["demo", demo_dir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "(1/3 files, 1/60 row groups)" in out      # value = 150
    assert "(2/3 files, 51/60 row groups)" in out     # OR range
    assert "(0/3 files, 0/60 row groups)" in out      # contradiction
    # the catalog DESCRIBE line: coverage + bounds trust per column
    assert "index describe: 3 files, 60 row groups, 3000 rows" in out
    assert "value[int] stats 60/60 rgs, bounds exact" in out
    assert "text[string] stats 60/60 rgs, bounds exact" in out
