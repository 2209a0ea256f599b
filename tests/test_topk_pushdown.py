"""TopK (ORDER BY + LIMIT) pushdown through the external index —
round 5's ordering generalization of the reference's LIMIT flow-through
(main.rs:285).

Soundness idea under test: every row group guarantees
(row_count - null_count) values >= its MIN, so accumulating guaranteed
counts over mins (sorted outward-in) until >= k yields a threshold t
with at least k values >= t in the table; only groups whose MAX >= t
can hold a top-k row. The residual orderBy+limit re-sorts scanned rows
exactly, so pruning can only skip I/O, never change the answer.
"""

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)

NAN = float("nan")


@pytest.fixture(scope="module")
def sorted_dir(tmp_path_factory):
    """Two files x 3 row groups of 100 values each, globally sorted —
    the layout where top-k pruning shines."""
    d = tmp_path_factory.mktemp("topk_sorted")
    for f, lo in (("a.parquet", 0), ("b.parquet", 300)):
        vals = list(range(lo, lo + 300))
        pq.write_table(pa.table({
            "id": pa.array(vals, pa.int64()),
            "v": pa.array(vals, pa.int64()),
        }), str(d / f), row_group_size=100)
    return str(d)


def test_topk_desc_prunes_to_tail(spark, sorted_dir):
    t = IndexedParquetTable(spark, sorted_dir, index_columns=["v"])
    got = [r["v"] for r in t.order_limit("v", 10, tiebreak=["id"]).collect()]
    assert got == list(range(599, 589, -1))
    pd = t.last_topk_pushdown
    assert pd["scanned_row_groups"] == 1, pd   # only b.parquet's last rg
    assert pd["candidate_row_groups"] == 6
    assert pd["threshold"] == 500


def test_topk_asc_prunes_to_head(spark, sorted_dir):
    t = IndexedParquetTable(spark, sorted_dir, index_columns=["v"])
    got = [r["v"] for r in
           t.order_limit("v", 5, descending=False, tiebreak=["id"]).collect()]
    assert got == [0, 1, 2, 3, 4]
    assert t.last_topk_pushdown["scanned_row_groups"] == 1


def test_topk_spanning_groups(spark, sorted_dir):
    """k larger than one group: threshold falls into the second group
    from the top; both tail groups scan, answer exact."""
    t = IndexedParquetTable(spark, sorted_dir, index_columns=["v"])
    got = [r["v"] for r in
           t.order_limit("v", 150, tiebreak=["id"]).collect()]
    assert got == list(range(599, 449, -1))
    assert t.last_topk_pushdown["scanned_row_groups"] == 2


def test_topk_with_predicate(spark, sorted_dir):
    """Predicate narrows the candidates first; top-k prunes within."""
    t = IndexedParquetTable(spark, sorted_dir, index_columns=["v"])
    got = [r["v"] for r in
           t.order_limit("v", 5, tiebreak=["id"],
                         predicate=col("v") < 250).collect()]
    assert got == [249, 248, 247, 246, 245]
    pd = t.last_topk_pushdown
    assert pd["scanned_row_groups"] == 1
    assert pd["candidate_row_groups"] == 3  # groups surviving v < 250


def test_topk_unsorted_layout_still_correct(spark, tmp_path):
    """Interleaved layout: pruning may keep several groups, the result
    must still equal the full-scan sort."""
    d = tmp_path / "shuffled"
    d.mkdir()
    vals = [7, 500, 3, 450, 90, 550, 12, 460, 33, 590, 1, 470]
    pq.write_table(pa.table({
        "id": pa.array(range(len(vals)), pa.int64()),
        "v": pa.array(vals, pa.int64()),
    }), str(d / "x.parquet"), row_group_size=3)
    t = IndexedParquetTable(spark, str(d), index_columns=["v"])
    got = [r["v"] for r in t.order_limit("v", 4, tiebreak=["id"]).collect()]
    assert got == [590, 550, 500, 470]


def test_topk_nulls_scan_all_when_needed(spark, tmp_path):
    """Fewer than k non-null guaranteed values: everything scans and
    NULLS LAST semantics fill the tail identically to a plain sort."""
    d = tmp_path / "nullish"
    d.mkdir()
    pq.write_table(pa.table({
        "id": pa.array(range(6), pa.int64()),
        "v": pa.array([10, None, None, 7, None, None], pa.int64()),
    }), str(d / "x.parquet"), row_group_size=3)
    t = IndexedParquetTable(spark, str(d), index_columns=["v"])
    got = [r["v"] for r in t.order_limit("v", 4, tiebreak=["id"]).collect()]
    assert got == [10, 7, None, None]
    assert t.last_topk_pushdown["threshold"] is None  # no pruning claimed


def test_topk_float_nan_blocks_pruning(spark, tmp_path):
    """A NaN outranks every stats-visible value: without NaN-free proof
    the top-k must scan everything (and return the NaN first); with
    recorded zero counts pruning re-arms."""
    d = tmp_path / "fnan"
    d.mkdir()
    pq.write_table(pa.table({
        "id": pa.array(range(6), pa.int64()),
        "v": pa.array([1.0, 2.0, NAN, 100.0, 101.0, 102.0], pa.float64()),
    }), str(d / "x.parquet"), row_group_size=3)
    t = IndexedParquetTable(spark, str(d), index_columns=["v"])
    got = [r["v"] for r in t.order_limit("v", 2, tiebreak=["id"]).collect()]
    assert math.isnan(got[0]) and got[1] == 102.0
    assert t.last_topk_pushdown["threshold"] is None

    d2 = tmp_path / "fclean"
    d2.mkdir()
    pq.write_table(pa.table({
        "id": pa.array(range(6), pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 100.0, 101.0, 102.0], pa.float64()),
    }), str(d2 / "x.parquet"), row_group_size=3)
    t2 = IndexedParquetTable(spark, str(d2), index_columns=["v"],
                             nan_count_columns=["v"])
    got2 = [r["v"] for r in t2.order_limit("v", 2, tiebreak=["id"]).collect()]
    assert got2 == [102.0, 101.0]
    assert t2.last_topk_pushdown["scanned_row_groups"] == 1


def test_topk_string_column(spark, tmp_path):
    d = tmp_path / "strs"
    d.mkdir()
    vals = ["apple", "pear", "fig", "zebra", "kiwi", "yam"]
    pq.write_table(pa.table({
        "id": pa.array(range(6), pa.int64()),
        "s": pa.array(vals, pa.string()),
    }), str(d / "x.parquet"), row_group_size=3)
    t = IndexedParquetTable(spark, str(d), index_columns=["s"])
    got = [r["s"] for r in t.order_limit("s", 2, tiebreak=["id"]).collect()]
    assert got == ["zebra", "yam"]


def test_topk_matches_full_sort_everywhere(spark, sorted_dir):
    """Sweep several (k, direction) shapes against the ground truth."""
    t = IndexedParquetTable(spark, sorted_dir, index_columns=["v"])
    full = spark.read.parquet(sorted_dir)
    for k in (1, 37, 120, 700):
        for desc in (True, False):
            got = [(r["v"], r["id"]) for r in
                   t.order_limit("v", k, descending=desc,
                                 tiebreak=["id"]).collect()]
            order = (F.col("v").desc_nulls_last() if desc
                     else F.col("v").asc_nulls_last())
            want = [(r["v"], r["id"]) for r in
                    full.orderBy(order, F.col("id").asc()).limit(k).collect()]
            assert got == want, (k, desc)
