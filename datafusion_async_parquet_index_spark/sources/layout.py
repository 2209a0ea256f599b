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
