"""Round-14 ADVICE fixes, each pinned by the failure it closes:

1. (medium) ``_normalize_arrow_units`` must admit ns timestamps with a
   NONZERO sub-microsecond remainder — pyarrow's default safe cast
   raises ``ArrowInvalid`` on exactly the files the normalizer exists
   to fix; values floor to microseconds like Spark's parquet reader.
2. (low) ``_acquire_process_lease`` retries only on CONTENTION errnos
   (EWOULDBLOCK/EAGAIN/EINTR); an EBADF or ENOLCK surfaces immediately
   instead of masquerading as a 60-second lease timeout.
3. (low) ``upsert_files`` validates the whole batch's rtree-stride
   precondition BEFORE the transaction, so one bad file can no longer
   roll back and silently discard its batch's good files.
"""

import os

import pyarrow as pa
import pytest

from datafusion_async_parquet_index_spark.sources.catalog import (
    _RTREE_ID_STRIDE,
    SqliteIndexCatalog,
)
from datafusion_async_parquet_index_spark.sources.rowgroup_source import (
    _normalize_arrow_units,
)
from datafusion_async_parquet_index_spark.sources.stats import (
    FileStats,
    RowGroupStats,
)


# -- 1. ns timestamps with sub-microsecond remainders --------------------

def test_normalize_arrow_units_truncates_sub_microsecond_ns():
    # 1500 ns and 999 ns: both have nonzero sub-us remainders — the
    # old table.cast(safe=True) path raised ArrowInvalid here
    ns = pa.array([1500, 999, 1_000_000_001],
                  type=pa.timestamp("ns"))
    ms = pa.array([1, 2], type=pa.timestamp("ms"))
    t = _normalize_arrow_units(pa.table({"a": ns}))
    assert t.schema.field("a").type == pa.timestamp("us")
    assert t.column("a").cast(pa.int64()).to_pylist() == [
        1, 0, 1_000_000]  # floored to us
    t2 = _normalize_arrow_units(pa.table({"b": ms}))
    assert t2.schema.field("b").type == pa.timestamp("us")
    assert t2.column("b").cast(pa.int64()).to_pylist() == [1000, 2000]


def test_normalize_arrow_units_preserves_tz_and_us_columns():
    tz = pa.array([1500], type=pa.timestamp("ns", tz="UTC"))
    us = pa.array([7], type=pa.timestamp("us"))
    t = _normalize_arrow_units(pa.table({"tz": tz, "us": us}))
    assert t.schema.field("tz").type == pa.timestamp("us", tz="UTC")
    assert t.schema.field("us").type == pa.timestamp("us")
    assert t.column("tz").cast(pa.int64()).to_pylist() == [1]


def test_rowgroup_scan_reads_sub_microsecond_ns_file(spark, tmp_path):
    """End-to-end: a parquet file whose ns timestamps all carry sub-us
    remainders must scan through the row-group DataSource path."""
    import json

    import pyarrow.parquet as pq

    from datafusion_async_parquet_index_spark.sources.rowgroup_source import (
        ensure_registered,
    )

    path = str(tmp_path / "ns.parquet")
    tbl = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "ts": pa.array([1001, 2_000_003, 3_000_000_999],
                       type=pa.timestamp("ns")),
    })
    pq.write_table(tbl, path, row_group_size=2)
    ensure_registered(spark)
    from pyspark.sql.pandas.types import from_arrow_schema

    target = pa.schema([pa.field("id", pa.int64()),
                        pa.field("ts", pa.timestamp("us"))])
    df = (spark.read.format("rowgroup_parquet")
          .schema(from_arrow_schema(target))
          .option("access_plan", json.dumps({path: [0, 1]}))
          .load())
    rows = sorted((r["id"], r["ts"].microsecond) for r in df.collect())
    # 1001 ns -> 1 us; 2_000_003 ns -> 2000 us; 3_000_000_999 -> 3000000us
    assert rows == [(1, 1), (2, 2000), (3, 0)]


# -- 2. lease acquisition fails fast on non-contention errors ------------

def test_lease_non_contention_oserror_raises_immediately(tmp_path):
    import time

    cat = SqliteIndexCatalog(str(tmp_path / "cat.db"))
    cat.initialize({"v": "int"})
    # a closed fd makes flock raise EBADF — must NOT spin for 60 s
    fd = os.open(str(tmp_path / "x"), os.O_RDWR | os.O_CREAT)
    os.close(fd)
    cat._lease_fd = fd
    t0 = time.monotonic()
    with pytest.raises(OSError):
        cat._acquire_process_lease()
    assert time.monotonic() - t0 < 5.0
    cat._lease_fd = None
    cat._conn.close()


def test_lease_contention_still_times_out(tmp_path):
    """The contention path keeps its TimeoutError semantics: a second
    fd holding LOCK_EX makes the acquire spin until the deadline."""
    import fcntl

    cat = SqliteIndexCatalog(str(tmp_path / "cat.db"))
    cat.initialize({"v": "int"})
    holder = os.open(str(tmp_path / "cat.db") + ".writer.lock",
                     os.O_RDWR | os.O_CREAT, 0o644)
    fcntl.flock(holder, fcntl.LOCK_EX)
    cat.LEASE_TIMEOUT_S = 0.2
    try:
        with pytest.raises(TimeoutError, match="writer lease"):
            cat._acquire_process_lease()
    finally:
        fcntl.flock(holder, fcntl.LOCK_UN)
        os.close(holder)
        cat._conn.close()


# -- 3. bulk upsert validates the batch before the transaction -----------

def test_upsert_files_bad_file_discards_nothing(tmp_path):
    cat = SqliteIndexCatalog(str(tmp_path / "cat.db"),
                             rtree_columns=["v"])
    cat.initialize({"v": "int"})
    good = [(FileStats(f"g{i}.parquet", 1, 1, 10),
             [RowGroupStats(row_group=0, row_count=10,
                            columns={"v": (0, 0, 9)})])
            for i in range(3)]
    bad = (FileStats("huge.parquet", 1, _RTREE_ID_STRIDE, 1), [])
    with pytest.raises(ValueError, match="before the batch"):
        cat.upsert_files(good[:2] + [bad] + good[2:])
    # precondition checked up front: NO file of the batch was written
    n = cat._query("SELECT COUNT(*) FROM file_statistics")[0][0]
    assert n == 0
    # the good files alone ingest fine afterwards
    assert cat.upsert_files(good) == 3
    n = cat._query("SELECT COUNT(*) FROM file_statistics")[0][0]
    assert n == 3
    cat._conn.close()
