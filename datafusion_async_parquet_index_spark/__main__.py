"""Runnable demo — the twin of the reference's demo binary.

The reference IS a demo program (``cargo run`` executes
``sqlx-sqlite/src/main.rs:119-190``: build three Parquet files, index
them in SQLite, run five queries, print each result table and the
pruning trace).  ``python -m datafusion_async_parquet_index_spark``
reproduces that run end-to-end on the same ported corpus, printing the
result rows and the "Files scanned" traces the reference README
documents as its golden output (``sqlx-sqlite/README.md:16-71``).

Usage::

    python -m datafusion_async_parquet_index_spark [data_dir]

With no argument the demo corpus is generated into a temp directory
(file1 0..100, file2 100..200, file3 200..3000, row-group size 50 —
``main.rs:93-100,341-354``).
"""

from __future__ import annotations

import sys
import tempfile

from . import IndexedParquetTable, col, get_spark
from .sources.demo_corpus import write_demo_corpus


def main(argv: list[str]) -> int:
    if len(argv) > 1:
        data_dir = argv[1]
    else:
        data_dir = tempfile.mkdtemp(prefix="sparkindex_demo_")
        write_demo_corpus(data_dir)
        print(f"demo corpus written to {data_dir}")

    spark = get_spark("demo")
    spark.sparkContext.setLogLevel("ERROR")
    table = IndexedParquetTable(spark, data_dir,
                                index_columns=["value", "text"])

    # catalog DESCRIBE — the freshness/completeness readout a 100 TB
    # operator pages on (per-column stat coverage + bounds trust), zero
    # Parquet I/O (table.describe_index)
    info = table.describe_index()
    per_col = "; ".join(
        f"{c}[{v['category']}] stats "
        f"{v['row_groups_with_stats']}/{info['row_groups']} rgs, "
        f"bounds {'exact' if v['bounds_exact'] else 'inexact'}"
        for c, v in sorted(info["columns"].items()))
    print(f"index describe: {info['files']} files, "
          f"{info['row_groups']} row groups, {info['rows']} rows | "
          f"{per_col}")

    # the five demo queries, main.rs:135-182
    demos = [
        ("SELECT file_name, value FROM index_table LIMIT 10",
         lambda: table.query(None, columns=["file_name", "value"]).limit(10)),
        ("value = 150",
         lambda: table.query(col("value") == 150)),
        ("value < 20 OR value > 500  (count per file)",
         lambda: table.query((col("value") < 20) | (col("value") > 500))
         .groupBy("file_name").count()),
        ("value < 20 AND text = 'a'",
         lambda: table.query((col("value") < 20) & (col("text") == "a"))),
        ("value > 500 AND text = 'a'  (contradiction => zero I/O)",
         lambda: table.query((col("value") > 500) & (col("text") == "a"))),
    ]
    for title, run in demos:
        print(f"\n=== {title} ===")
        run().show(10, truncate=False)
        print(table.last_scan.describe())

    # the session is NOT stopped here: get_spark returns the active
    # session when one exists (e.g. a test harness driving main()), and
    # stopping a borrowed session would kill the caller's Spark
    return 0


if __name__ == "__main__":
    rc = main(sys.argv)
    from .session import get_spark as _gs
    _gs("demo").stop()
    sys.exit(rc)
