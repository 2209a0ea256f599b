"""Data-layout helpers: make the external index EFFECTIVE, not just
correct.

Min/max pruning works exactly as well as the data layout lets it: if a
column's values are scattered randomly across files, every row group's
[min,max] spans the whole domain and nothing can be refuted. Range-
partitioning + sorting on the indexed column before write gives files
and row groups disjoint value ranges, so a point or range predicate
prunes all but a handful — the difference between "index exists" and
"index eliminates 99% of I/O" at 100 TB. (The reference's demo corpus
is built the same way: files with disjoint value ranges,
main.rs:93-100.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def compact_to(
    table,
    dest_path: str,
    sort_cols: Sequence[str],
    target_file_bytes: int = 512 << 20,
    row_group_bytes: int = 8 << 20,
):
    """Compact an indexed table's directory into a fresh range-sorted
    layout at dest_path and return a new IndexedParquetTable over it
    (same index columns, fresh index). Functional, not in-place: the
    source directory is untouched, so readers never see a half-compacted
    table — swap directories (or table pointers) atomically outside.
    Small-file proliferation is the other big pruning killer at 100 TB:
    footer/task overhead grows with file count while row groups stay
    tiny."""
    total_bytes = sum(f[1] for f in table.catalog.all_files())
    num_files = max(1, -(-total_bytes // target_file_bytes))  # ceil
    write_range_sorted(table.to_df(), dest_path, sort_cols,
                       num_files=num_files, row_group_bytes=row_group_bytes)
    from .df_catalog import DataFrameIndexCatalog
    from .table import IndexedParquetTable
    if isinstance(table.catalog, DataFrameIndexCatalog):
        fresh = DataFrameIndexCatalog(table.spark)
    else:
        fresh = type(table.catalog)()
    return IndexedParquetTable(
        table.spark, dest_path, list(table.index_schema), catalog=fresh)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    num_files: int = 8,
    row_group_bytes: int = 1 << 20,
    bits_per_col: int = 8,
) -> None:
    """Write Parquet laid out along a Z-order (Morton) curve over
    2..4 columns, so min/max pruning works for predicates on ANY of the
    columns — range-sorting on one column gives perfect pruning on it
    and none on the others; Z-ordering gives good (not perfect) pruning
    on each.

    Spark-first implementation, no UDFs:
      1. per column, compute ~2^bits_per_col approx-quantile boundaries
         (driver-side array of <=256 doubles — a metadata-sized
         collect, same at any data scale);
      2. map each value to its bucket rank with a broadcast-literal
         boundary array folded via ``F.aggregate`` (JVM codegen,
         O(2^bits) comparisons per row);
      3. bit-interleave the ranks into one integer z-value with
         shift/or expressions;
      4. range-partition + sort by z (the existing range-sorted path),
         drop the helper column, write with forced row-group size.

    Quantile (not min/max) normalization makes the curve robust to
    skew: each bucket holds ~equal row counts, so every z-cell maps to
    ~equal data volume.  NULLs rank below bucket 0.  Columns must be
    numeric / date / timestamp (castable to double for quantiles)."""
    from pyspark.sql import functions as F

    cols = list(zorder_cols)
    if not 2 <= len(cols) <= 4:
        raise ValueError("z-order needs 2..4 columns, got %r" % (cols,))
    nbuckets = 1 << bits_per_col

    casted = df.select(
        "*", *[F.col(c).cast("double").alias(f"__zc_{c}") for c in cols])
    # one pass, all columns at once; relativeError 1/(4*buckets) keeps
    # bucket populations near-uniform without a full sort
    bounds = casted.stat.approxQuantile(
        [f"__zc_{c}" for c in cols],
        [i / nbuckets for i in range(1, nbuckets)], 1.0 / (4 * nbuckets))

    z = None
    for ci, (c, bs) in enumerate(zip(cols, bounds)):
        arr = F.array(*[F.lit(float(b)) for b in bs])
        rank = F.aggregate(
            arr, F.lit(0),
            lambda acc, b: acc + F.when(F.col(f"__zc_{c}") > b, 1).otherwise(0))
        rank = F.coalesce(rank, F.lit(0))
        # interleave: bit j of column ci lands at position j*ncols + ci
        for j in range(bits_per_col):
            bit = F.shiftright(rank, j).bitwiseAND(F.lit(1))
            placed = F.shiftleft(bit, j * len(cols) + ci)
            z = placed if z is None else z.bitwiseOR(placed)

    zed = casted.withColumn("__zval", z).drop(*[f"__zc_{c}" for c in cols])
    (zed.repartitionByRange(num_files, "__zval")
     .sortWithinPartitions("__zval")
     .drop("__zval")
     .write.mode("overwrite")
     .option("parquet.block.size", str(row_group_bytes))
     .parquet(path))


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    num_files: int = 8,
    row_group_bytes: int = 1 << 20,
) -> None:
    """Write Parquet range-partitioned AND sorted on sort_cols:
    repartitionByRange gives each output file a disjoint slice of the
    sort-key domain; sortWithinPartitions orders rows inside, so every
    row group's [min,max] is tight and disjoint. row_group_bytes maps to
    parquet.block.size (small values => more row groups => finer
    pruning granularity, at footer-metadata cost)."""
    (df.repartitionByRange(num_files, *sort_cols)
     .sortWithinPartitions(*sort_cols)
     .write.mode("overwrite")
     .option("parquet.block.size", str(row_group_bytes))
     .parquet(path))
