"""Layout matters: the same data, same index, same query must prune far
better when written range-sorted on the indexed column than when
scattered randomly.
"""

from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.layout import (
    write_range_sorted,
)
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)


def test_range_sorted_layout_prunes_better(spark, tmp_path):
    n = 20_000
    base = spark.range(n).select(
        F.col("id").cast("int").alias("value"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    scattered_dir = str(tmp_path / "scattered")
    sorted_dir = str(tmp_path / "sorted")
    # scatter: shuffle rows into files by hash => every file spans the domain
    (base.repartition(8, "payload").write
     .option("parquet.block.size", str(1 << 16)).parquet(scattered_dir))
    write_range_sorted(base, sorted_dir, ["value"], num_files=8,
                       row_group_bytes=1 << 16)

    t_scatter = IndexedParquetTable(spark, scattered_dir, ["value"])
    t_sorted = IndexedParquetTable(spark, sorted_dir, ["value"])
    pred = (col("value") >= 5_000) & (col("value") < 5_100)

    rows_scatter = sorted(r["value"] for r in t_scatter.query(pred).collect())
    d_scatter = t_scatter.last_scan
    rows_sorted = sorted(r["value"] for r in t_sorted.query(pred).collect())
    d_sorted = t_sorted.last_scan

    # identical answers...
    assert rows_scatter == rows_sorted == list(range(5_000, 5_100))
    # ...but the sorted layout touches one file and a sliver of row
    # groups while the scattered layout reads everything
    assert len(d_scatter.files_scanned) == 8
    assert len(d_sorted.files_scanned) == 1
    assert d_sorted.row_groups_scanned < d_scatter.row_groups_scanned / 4


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    """Range-sorting on `a` gives perfect pruning on a and NONE on b;
    z-ordering (a, b) must prune substantially on BOTH."""
    from datafusion_async_parquet_index_spark.sources.layout import (
        write_zordered,
    )

    n = 40_000
    # two independent uniform dimensions
    base = spark.range(n).select(
        F.col("id").cast("int").alias("a"),
        F.pmod(F.hash(F.col("id").cast("string")), F.lit(40_000))
         .cast("int").alias("b"),
        # payload fattens rows so each file holds several row groups —
        # pruning granularity below file level
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    sorted_dir = str(tmp_path / "asorted")
    z_dir = str(tmp_path / "zorder")
    write_range_sorted(base, sorted_dir, ["a"], num_files=8,
                       row_group_bytes=1 << 15)
    write_zordered(base, z_dir, ["a", "b"], num_files=8,
                   row_group_bytes=1 << 15)

    t_sorted = IndexedParquetTable(spark, sorted_dir, ["a", "b"])
    t_z = IndexedParquetTable(spark, z_dir, ["a", "b"])

    pred_a = (col("a") >= 5_000) & (col("a") < 5_200)
    pred_b = (col("b") >= 5_000) & (col("b") < 5_200)

    # identical answers on every combination
    for t in (t_sorted, t_z):
        assert {r["a"] for r in t.query(pred_a).collect()} == set(
            range(5_000, 5_200))
    rows_b_sorted = sorted(r["b"] for r in t_sorted.query(pred_b).collect())
    d_b_sorted = t_sorted.last_scan
    rows_b_z = sorted(r["b"] for r in t_z.query(pred_b).collect())
    d_b_z = t_z.last_scan
    assert rows_b_sorted == rows_b_z and len(rows_b_z) > 0

    # the a-sorted layout cannot meaningfully prune on b: allow a
    # one-row-group sliver, because repartitionByRange draws its
    # boundaries from a RANDOM sample per run, so a boundary row
    # group's b-range occasionally happens to refute the predicate
    # (observed 57/58 once in-suite; the claim under test is "no
    # useful pruning", not "bit-identical boundaries")
    assert d_b_sorted.row_groups_scanned >= d_b_sorted.total_row_groups - 1
    # ...the z-ordered layout prunes most row groups on b AND on a
    assert d_b_z.row_groups_scanned < d_b_z.total_row_groups / 2
    t_z.query(pred_a).collect()
    d_a_z = t_z.last_scan
    assert d_a_z.row_groups_scanned < d_a_z.total_row_groups / 2


def test_compact_to_fresh_sorted_table(spark, tmp_path, demo_dir):
    from datafusion_async_parquet_index_spark.sources.layout import compact_to

    t = IndexedParquetTable(spark, demo_dir, ["value", "text"])
    dest = str(tmp_path / "compacted")
    t2 = compact_to(t, dest, ["value"], target_file_bytes=1 << 30)
    # one compacted file, same rows, working index over the new layout
    assert len(t2.catalog.all_files()) == 1
    assert t2.count_rows() == t.count_rows() == 3000
    rows = t2.query(col("value") == 150).collect()
    assert [r["value"] for r in rows] == [150]
    assert t2.last_scan.row_groups_scanned <= 1
    # source untouched
    assert len(t.catalog.all_files()) == 3


def test_ivf_layout_topk_parity_and_partition_pruning(spark, sf_dir, tmp_path):
    """nprobe=1 over the cell-partitioned layout is row-identical to the
    logical IVF operator, and the candidate scan prunes DIRECTORIES
    (PartitionFilters on the cell partition column), not rows."""
    from datafusion_async_parquet_index_spark.operators.similarity import (
        ivf_layout_topk, sim_ivf_topk, write_ivf_layout,
    )
    from datafusion_async_parquet_index_spark.operators.util import read_table

    layout_dir = str(tmp_path / "ivf_layout")
    write_ivf_layout(read_table(spark, sf_dir, "embeddings"), layout_dir)

    got = ivf_layout_topk(spark, layout_dir, nprobe=1)
    want = sim_ivf_topk(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan
    n_cells = len([p for p in (tmp_path / "ivf_layout").iterdir()
                   if p.name.startswith("cell=")])
    assert n_cells > 1

    # higher nprobe only widens the candidate set (recall monotonicity)
    wider = ivf_layout_topk(spark, layout_dir, nprobe=2)
    assert wider.count() >= got.count()
