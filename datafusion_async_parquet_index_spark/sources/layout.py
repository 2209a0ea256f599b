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
