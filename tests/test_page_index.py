"""Page-index (sub-row-group) pruning tier — VERDICT r11 ask #3, the
reference's named-but-unimplemented third granularity
(sqlx-sqlite/src/main.rs:73-79).

Pinned here:
- the from-scratch thrift-compact ColumnIndex/OffsetIndex reader
  (sources/page_index.py) agrees with ground truth computed directly
  from the data (per-page spans, min/max bounds, null pages) on both
  pyarrow- and Spark-written files;
- the golden-trace claim: a point/range predicate on a sorted,
  page-indexed column scans FEWER ROWS than the row-group tier
  (decision.page_rows_skipped > 0) and still returns exactly the
  right rows through mode="rowgroups";
- refutation soundness, property-fuzzed: page-pruned scan + residual
  filter ≡ full scan + filter for random range/point/IN predicates;
- cross-column intersection can refute a WHOLE row group (opposite
  sort orders), and absence of a page index degrades to row-group
  granularity, never to wrong results;
- deletion vectors compose with row ranges (both masks apply);
- the driver-side stats evaluator's SQL semantics (three-valued
  AND/OR, NULL propagation, SQLite integer division/modulo, LIKE);
- catalog persistence: page rows survive reopen, are replaced on file
  change, and are dropped with the file; DataFrame-catalog parity.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import col, lit
from datafusion_async_parquet_index_spark.plans.pruning import (
    eval_stats_expr,
)
from datafusion_async_parquet_index_spark.sources.catalog import (
    SqliteIndexCatalog,
)
from datafusion_async_parquet_index_spark.sources.page_index import (
    extract_file_page_stats,
)
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
    _intersect_ranges,
)


def _write_sorted(path, n=20_000, rg=10_000, page_rows=500):
    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "s": pa.array([f"w{i:06d}" for i in range(n)]),
        "r": pa.array([f"w{n - 1 - i:06d}" for i in range(n)]),  # desc
        "nul": pa.array([None if i % 2 else i for i in range(n)],
                        pa.int64()),
    })
    pq.write_table(t, path, row_group_size=rg, data_page_size=512,
                   write_batch_size=page_rows, write_page_index=True)
    return t


@pytest.fixture(scope="module")
def page_table(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("page_tier"))
    _write_sorted(os.path.join(d, "a.parquet"))
    t = IndexedParquetTable(
        spark, d, ["k", "s", "r", "nul"],
        catalog=SqliteIndexCatalog(),
        page_index_columns=["k", "s", "r", "nul"])
    return t


# -- thrift reader vs ground truth -------------------------------------

def test_extractor_matches_ground_truth(tmp_path):
    p = str(tmp_path / "gt.parquet")
    t = _write_sorted(p, n=4_000, rg=2_000, page_rows=250)
    ps = extract_file_page_stats(p, ("k", "s", "nul"))
    ks = t.column("k").to_pylist()
    for (rg, colname), pages in ps.items():
        base = rg * 2_000
        assert sum(x.row_count for x in pages) == 2_000
        assert pages[0].first_row == 0
        for x in pages:
            lo, hi = base + x.first_row, base + x.first_row + x.row_count
            if colname == "k":
                assert x.min_value == ks[lo]
                assert x.max_value == ks[hi - 1]
                assert x.null_count == 0 and not x.null_page
            elif colname == "s":
                assert x.min_value == f"w{lo:06d}"
                assert x.max_value == f"w{hi - 1:06d}"
            elif colname == "nul":
                vals = [v for v in (None if i % 2 else i
                                    for i in range(lo, hi))
                        if v is not None]
                assert x.null_count == (hi - lo) - len(vals)
                if vals:
                    assert x.min_value == min(vals)
                    assert x.max_value == max(vals)
    # a file written WITHOUT a page index yields nothing (conservative)
    p2 = str(tmp_path / "noidx.parquet")
    pq.write_table(t, p2, row_group_size=2_000)
    assert extract_file_page_stats(p2, ("k",)) == {}


def test_extractor_reads_spark_written_files(spark, tmp_path):
    d = str(tmp_path / "sparkw")
    (spark.range(30_000).selectExpr("id as k").coalesce(1)
     .write.mode("overwrite")
     .option("parquet.page.row.count.limit", "1000").parquet(d))
    f = next(os.path.join(d, x) for x in sorted(os.listdir(d))
             if x.endswith(".parquet"))
    ps = extract_file_page_stats(f, ("k",))
    assert ps, "parquet-mr default page index not found"
    pages = next(iter(ps.values()))
    assert len(pages) >= 2
    assert sum(x.row_count for x in pages) >= 1000


# -- golden trace: fewer rows than the row-group tier -------------------

def test_point_predicate_prunes_rows(page_table):
    dec = page_table.plan_scan(col("k") == 4_242)
    # row-group tier alone keeps 10,000 rows; the page tier must prove
    # most of them non-matching
    assert dec.row_groups_scanned == 1
    assert dec.page_rows_skipped >= 9_000, dec.describe()
    assert "page index skipped" in dec.describe()
    rows = page_table.query(col("k") == 4_242,
                            mode="rowgroups").collect()
    assert len(rows) == 1 and rows[0]["s"] == "w004242"


def test_range_predicate_row_ranges_exact(page_table):
    pred = (col("k") >= 3_100) & (col("k") < 3_200)
    out = page_table.query(pred, mode="rowgroups")
    got = sorted(r["k"] for r in out.collect())
    assert got == list(range(3_100, 3_200))
    dec = page_table.last_scan
    assert dec.page_rows_skipped > 0
    # the recorded keep-ranges cover every match (page-aligned slack ok)
    spans = dec.row_ranges["a.parquet"][0]
    covered = set()
    for s, e in spans:
        covered.update(range(s, e))
    assert set(range(3_100, 3_200)) <= covered


def test_cross_column_intersection_refutes_whole_rg(page_table):
    # s ascending keeps only the FIRST pages, r descending keeps only
    # the LAST pages of row group 0 — the intersection is empty, so
    # the row group (and with it the file) drops out entirely
    pred = (col("s") < "w000400") & (col("r") < "w000400")
    dec = page_table.plan_scan(pred)
    assert dec.files_scanned == {}, dec.describe()
    assert page_table.query(pred, mode="rowgroups").count() == 0
    assert page_table.query(pred, mode="files").count() == 0


def test_is_null_and_not_null_pages(page_table):
    # nul is NULL on odd rows everywhere, so no page refutes IS NULL;
    # the tier must not produce wrong results either way
    n_null = page_table.query(col("nul").is_null(),
                              mode="rowgroups").count()
    assert n_null == 10_000


# -- property fuzz: page-pruned ≡ full scan + filter --------------------

@settings(max_examples=20, deadline=None)
@given(st.integers(-100, 20_100), st.integers(0, 3_000),
       st.sampled_from(["point", "range", "in", "mixed"]))
def test_page_pruning_soundness_fuzz(spark, page_table, lo, width, shape):
    if shape == "point":
        pred = col("k") == lo
    elif shape == "range":
        pred = (col("k") >= lo) & (col("k") < lo + width)
    elif shape == "in":
        pred = col("k").isin([lo, lo + width, lo + 2 * width + 1])
    else:
        pred = ((col("k") >= lo) & (col("k") < lo + width)
                & (col("s") >= "w000050"))
    got = sorted(r["k"] for r in
                 page_table.query(pred, mode="rowgroups").collect())
    want = sorted(r["k"] for r in
                  page_table.query(None).filter(pred.to_spark()).collect())
    assert got == want


# -- deletion vectors compose with row ranges ---------------------------

def test_row_ranges_compose_with_deletion_vectors(spark, tmp_path):
    d = str(tmp_path / "dv_pages")
    os.makedirs(d)
    _write_sorted(os.path.join(d, "a.parquet"), n=8_000, rg=4_000,
                  page_rows=250)
    t = IndexedParquetTable(spark, d, ["k"],
                            catalog=SqliteIndexCatalog(),
                            page_index_columns=["k"])
    n_del = t.delete_where((col("k") >= 1_000) & (col("k") < 1_010))
    assert n_del == 10
    pred = (col("k") >= 990) & (col("k") < 1_020)
    got = sorted(r["k"] for r in t.query(pred, mode="rowgroups").collect())
    assert got == list(range(990, 1_000)) + list(range(1_010, 1_020))
    assert t.last_scan.page_rows_skipped > 0


# -- conservatism & persistence -----------------------------------------

def test_no_page_index_degrades_to_rowgroups(spark, tmp_path):
    d = str(tmp_path / "noidx_table")
    os.makedirs(d)
    t = pa.table({"k": pa.array(range(5_000), pa.int64())})
    pq.write_table(t, os.path.join(d, "a.parquet"), row_group_size=2_500)
    tab = IndexedParquetTable(spark, d, ["k"],
                              catalog=SqliteIndexCatalog(),
                              page_index_columns=["k"])
    dec = tab.plan_scan(col("k") == 77)
    assert dec.page_rows_skipped == 0 and not dec.row_ranges
    assert tab.query(col("k") == 77, mode="rowgroups").count() == 1


def test_refine_cap_degrades_gracefully(page_table, monkeypatch):
    """Above PAGE_REFINE_MAX_RGS surviving row groups the tier skips
    (bounded planning data) — correctness unchanged."""
    monkeypatch.setattr(IndexedParquetTable, "PAGE_REFINE_MAX_RGS", 0)
    dec = page_table.plan_scan(col("k") == 4_242)
    assert dec.page_rows_skipped == 0 and not dec.row_ranges
    assert page_table.query(col("k") == 4_242,
                            mode="rowgroups").count() == 1


def test_page_rows_replaced_on_file_change_and_removed(spark, tmp_path):
    d = str(tmp_path / "repl")
    os.makedirs(d)
    p = os.path.join(d, "a.parquet")
    _write_sorted(p, n=4_000, rg=2_000, page_rows=250)
    _write_sorted(os.path.join(d, "b.parquet"), n=1_000, rg=1_000,
                  page_rows=250)
    cat = SqliteIndexCatalog()
    t = IndexedParquetTable(spark, d, ["k"], catalog=cat,
                            page_index_columns=["k"])
    n0 = len(cat.get_page_stats(["a.parquet"], ["k"]))
    assert n0 == 2  # two row groups
    # rewrite the file smaller: rows must be REPLACED, not accreted
    _write_sorted(p, n=2_000, rg=2_000, page_rows=250)
    t.refresh()
    after = cat.get_page_stats(["a.parquet"], ["k"])
    assert set(after) == {("a.parquet", 0, "k")}
    # dropping the file drops its page rows with it
    os.remove(p)
    t.refresh()
    assert cat.get_page_stats(["a.parquet"], ["k"]) == {}
    assert cat.get_page_stats(["b.parquet"], ["k"]) != {}


def test_compaction_preserves_page_tier(spark, tmp_path):
    """compact_deletes rewrites with write_page_index=True, so the
    page tier survives DV materialization (a rewrite that silently
    stripped the ColumnIndex would degrade every later point lookup
    back to row-group granularity)."""
    d = str(tmp_path / "compact_pages")
    os.makedirs(d)
    _write_sorted(os.path.join(d, "a.parquet"), n=8_000, rg=4_000,
                  page_rows=250)
    cat = SqliteIndexCatalog()
    t = IndexedParquetTable(spark, d, ["k"], catalog=cat,
                            page_index_columns=["k"])
    assert t.delete_where((col("k") >= 100) & (col("k") < 150)) == 50
    assert t.compact_deletes() == 1
    # the rewritten file re-indexed WITH page rows (at this fixture
    # size each rewritten row group fits one 1MB-default page, so the
    # tier keeps row-group granularity — the point is the CAPABILITY
    # survives the rewrite; production row groups span many pages)
    pages = cat.get_page_stats(["a.parquet"], ["k"])
    assert pages, "compaction stripped the page index"
    assert {rg for (_, rg, _) in pages} == {0, 1}
    assert t.query(col("k") == 5_000, mode="rowgroups").count() == 1
    assert t.query(col("k") == 120, mode="rowgroups").count() == 0


def test_dataframe_catalog_parity(spark, tmp_path):
    from datafusion_async_parquet_index_spark.sources.df_catalog import (
        DataFrameIndexCatalog,
    )
    d = str(tmp_path / "dfcat")
    os.makedirs(d)
    _write_sorted(os.path.join(d, "a.parquet"), n=8_000, rg=4_000,
                  page_rows=250)
    t1 = IndexedParquetTable(spark, d, ["k"],
                             catalog=SqliteIndexCatalog(),
                             page_index_columns=["k"])
    t2 = IndexedParquetTable(spark, d, ["k"],
                             catalog=DataFrameIndexCatalog(spark),
                             page_index_columns=["k"])
    for pred in (col("k") == 123,
                 (col("k") >= 5_000) & (col("k") < 5_100)):
        d1, d2 = t1.plan_scan(pred), t2.plan_scan(pred)
        assert d1.files_scanned == d2.files_scanned
        assert d1.row_ranges == d2.row_ranges
        assert d1.page_rows_skipped == d2.page_rows_skipped


# -- evaluator semantics -------------------------------------------------

def test_eval_stats_expr_semantics():
    e = (col("m") <= 5) & (col("M") >= 5)
    assert eval_stats_expr(e, {"m": 0, "M": 9}) is True
    assert eval_stats_expr(e, {"m": 6, "M": 9}) is False
    assert eval_stats_expr(e, {"m": None, "M": 9}) is None
    # OR three-valued: UNKNOWN OR TRUE = TRUE
    assert eval_stats_expr((col("m") < lit(None)) | (col("M") > 0),
                           {"m": 1, "M": 1}) is True
    # SQLite integer division truncates toward zero; % takes the
    # dividend's sign
    assert eval_stats_expr(col("m") / 2 == -3, {"m": -7}) is True
    assert eval_stats_expr(col("m") % 2 == -1, {"m": -7}) is True
    # division by zero -> NULL -> UNKNOWN
    assert eval_stats_expr(col("m") / 0 == 1, {"m": 4}) is None
    # LIKE with % and _
    assert eval_stats_expr(col("m").like("w%9_"), {"m": "w0095"}) is True
    assert eval_stats_expr(col("m").like("w%9_"), {"m": "x0095"}) is False
    # unsupported node / type mismatch -> UNKNOWN, never a crash
    assert eval_stats_expr(col("m") < 5, {"m": "str"}) is None


def test_intersect_ranges():
    assert _intersect_ranges([(0, 10)], [(5, 20)]) == [(5, 10)]
    assert _intersect_ranges([(0, 5), (10, 15)],
                             [(3, 12)]) == [(3, 5), (10, 12)]
    assert _intersect_ranges([(0, 5)], [(5, 9)]) == []
    assert _intersect_ranges([], [(0, 5)]) == []
