"""Streaming ingestion that maintains the external index.

The reference is an *async* parquet index: its tokio maintenance loop
keeps the catalog in sync while files land
(``/root/reference/sqlx-sqlite/src/index.rs:179`` add_file is async; the
module doc's architecture has the index updated out-of-band of queries).
The Structured-Streaming twin of that posture: a ``foreachBatch`` sink
writes each micro-batch as Parquet into an ``IndexedParquetTable``'s
directory and immediately re-indexes — ``refresh()`` is incremental
(size short-circuit), so the per-batch maintenance cost is O(files in
the batch), never O(table).

At scale this is the standard lakehouse ingest loop: executors write
the batch files in parallel; only the footer stats of the NEW files are
extracted (fanned out when large); the catalog upsert is a small
transaction. Query-side sessions see each batch's files as soon as
their own ``refresh()`` runs — same freshness model as the reference's
out-of-band maintenance.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

from ..sources.table import IndexedParquetTable


def indexed_ingest_sink(table: IndexedParquetTable) -> Callable:
    """foreachBatch function: append the micro-batch to the table's
    directory as Parquet, then incrementally re-index.

    Usage::

        q = (stream.writeStream.outputMode("append")
             .foreachBatch(indexed_ingest_sink(table))
             .option("checkpointLocation", ckpt).start())

    Idempotent under replay (the foreachBatch exactly-once contract is
    at-least-once delivery of each batch_id): the batch writes to a
    scratch dir, then its part files move to the table dir under
    deterministic ``ingest-b<batch_id>-<n>.parquet`` names, after any
    files of a previous partial attempt of the SAME batch are removed —
    a crash-replayed batch replaces itself instead of duplicating rows.
    The subsequent ``refresh()`` is incremental: only the new/changed
    files' footers are read."""
    import glob
    import os
    import shutil

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        scratch = os.path.join(table.data_dir, f"_ingest_tmp_b{batch_id}")
        batch_df.write.mode("overwrite").parquet(scratch)
        prefix = os.path.join(table.data_dir, f"ingest-b{batch_id:06d}-")
        for stale in glob.glob(prefix + "*.parquet"):
            os.remove(stale)  # partial previous attempt of this batch
        parts = sorted(glob.glob(os.path.join(scratch, "part-*.parquet")))
        for n, p in enumerate(parts):
            os.replace(p, f"{prefix}{n:04d}.parquet")
        shutil.rmtree(scratch, ignore_errors=True)
        table.refresh()

    return _sink


def partitioned_ingest_sink(
    table: IndexedParquetTable, partition_cols,
) -> Callable:
    """foreachBatch sink for a PARTITIONED IndexedParquetTable — the
    production lakehouse ingest shape: each micro-batch writes
    hive-style ``key=value`` directories (e.g. an event-date column),
    its part files move under the matching table partition dirs with
    deterministic per-batch names, and the incremental ``refresh()``
    indexes the new files with their partition values as degenerate
    min=max stats. Same idempotency contract as ``indexed_ingest_sink``:
    a crash-replayed batch first removes its own previous partial
    attempt (across all partition dirs), so it replaces itself. The
    scratch dir is ``_``-prefixed, which the recursive lister ignores
    by convention."""
    import glob
    import os
    import shutil

    cols = list(partition_cols)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        scratch = os.path.join(table.data_dir, f"_ingest_tmp_b{batch_id}")
        batch_df.write.mode("overwrite").partitionBy(*cols).parquet(scratch)
        prefix = f"ingest-b{batch_id:06d}-"
        for stale in glob.glob(
                os.path.join(table.data_dir, "**", prefix + "*.parquet"),
                recursive=True):
            if f"_ingest_tmp_b{batch_id}" not in stale:
                os.remove(stale)  # partial previous attempt of this batch
        parts = sorted(glob.glob(
            os.path.join(scratch, "**", "part-*.parquet"), recursive=True))
        for n, p in enumerate(parts):
            rel = os.path.relpath(os.path.dirname(p), scratch)
            dest_dir = (table.data_dir if rel == "."
                        else os.path.join(table.data_dir, rel))
            os.makedirs(dest_dir, exist_ok=True)
            os.replace(p, os.path.join(dest_dir, f"{prefix}{n:04d}.parquet"))
        shutil.rmtree(scratch, ignore_errors=True)
        table.refresh()

    return _sink


def ingest_stream_to_indexed_table(
    source_stream: DataFrame,
    table: IndexedParquetTable,
    checkpoint_dir: str,
    trigger_once: bool = True,
    query_name: Optional[str] = None,
):
    """Wire a streaming DataFrame into an indexed table and start the
    query. trigger_once processes all available input then stops — the
    batch-ingest-shaped trigger used in tests and backfills; pass False
    for a continuous micro-batch trigger."""
    w = (source_stream.writeStream
         .outputMode("append")
         .foreachBatch(indexed_ingest_sink(table))
         .option("checkpointLocation", checkpoint_dir))
    if query_name:
        w = w.queryName(query_name)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
