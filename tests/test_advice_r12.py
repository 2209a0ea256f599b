"""Regression tests for the round-11 ADVICE findings + VERDICT asks:

1. (medium) The optimistic-concurrency CAS now shares a writer LEASE
   with the verb's mutation phase (``_dml_mutation_scope``): a second
   in-process writer that begins after verb A's successful CAS can no
   longer CAS its own commit and mutate while A is still mid-mutation
   — it blocks on the lease until A's committed work is fully applied,
   then refuses (version moved). Pinned with a threaded interleave
   that records the ordering.
2. (low) ``append(merge_schema=True)`` with a zero-row batch still
   commits the schema evolution (Delta mergeSchema parity) instead of
   silently dropping it.
3. (low) ``SqliteIndexCatalog.version()`` maps ONLY the missing-table
   error to 0; transient errors (locked database) propagate instead of
   being misread as a pre-migration catalog (which produced a spurious
   ConcurrentWriteError diagnosis).
4. (low) ``decode_png`` raises ValueError — not struct.error — on a
   well-framed (CRC-valid) IHDR chunk whose payload is shorter than
   13 bytes.
5. (VERDICT ask #6) ``with_commit_retries``: three writers racing the
   same table all eventually commit exactly once.
6. (VERDICT ask #7) ``cosine_pairs`` enforces its bounded-subset
   contract: inputs past ``max_rows`` refuse loudly.
"""

import os
import struct
import threading
import time
import zlib

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.operators.dedup import (
    cosine_pairs,
)
from datafusion_async_parquet_index_spark.operators.multimodal import (
    decode_png,
    encode_png,
)
from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.catalog import (
    ConcurrentWriteError,
    SqliteIndexCatalog,
)
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
    with_commit_retries,
)

from fixture_io import one_file as _one_file


def _corpus(spark, d):
    os.makedirs(d, exist_ok=True)
    base = spark.range(1_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 100).cast("long").alias("v"))
    _one_file(base.orderBy("k"), d, "a.parquet")


# -- 1. writer lease closes the post-CAS mutation race ----------------

def test_lease_blocks_second_writer_until_mutation_done(spark, tmp_path):
    """Writer A (delete) stalls mid-mutation (inside upsert_dv, i.e.
    AFTER its CAS); writer B (append) starts during the stall. Without
    the lease B would CAS and mutate concurrently; with it B must not
    reach its own CAS until A's mutation phase finished."""
    d = str(tmp_path / "lease")
    _corpus(spark, d)
    cat = SqliteIndexCatalog()
    ta = IndexedParquetTable(spark, d, ["k", "v"], catalog=cat)
    tb = IndexedParquetTable(spark, d, ["k", "v"], catalog=cat)

    events = []
    a_mutating = threading.Event()
    real_upsert_dv = cat.upsert_dv

    def slow_upsert_dv(*a, **kw):
        events.append(("A_mutating", time.monotonic()))
        a_mutating.set()
        time.sleep(0.6)
        out = real_upsert_dv(*a, **kw)
        events.append(("A_done", time.monotonic()))
        return out

    cat.upsert_dv = slow_upsert_dv
    real_commit = cat.commit_version

    def traced_commit(expected, verb="dml"):
        events.append((f"CAS_{verb}", time.monotonic()))
        return real_commit(expected, verb)

    cat.commit_version = traced_commit

    b_result = {}

    def writer_b():
        # start only once A is INSIDE its post-CAS mutation stall
        assert a_mutating.wait(timeout=120)
        batch = spark.range(10).select(
            (F.col("id") + 5_000).cast("long").alias("k"),
            F.lit(1).cast("long").alias("v"))
        try:
            b_result["n"] = tb.append(batch)
        except ConcurrentWriteError as exc:
            b_result["err"] = exc

    t = threading.Thread(target=writer_b)
    t.start()
    n_del = ta.delete_where(col("v") == 7)
    t.join()
    cat.upsert_dv = real_upsert_dv
    cat.commit_version = real_commit

    assert n_del > 0
    by_name = {}
    for name, ts in events:
        by_name.setdefault(name, []).append(ts)
    # B's CAS attempt (refusal or success) happened only AFTER A's
    # mutation phase completed — never inside the stall window
    assert "CAS_append" in by_name, (b_result, events)
    assert by_name["CAS_append"][0] >= by_name["A_done"][-1], events
    # and B then either refused loudly (version moved) or, had it read
    # the version after A's commit, succeeded — both are post-lease
    assert ("err" in b_result) or b_result.get("n") == 10


# -- 2. empty-batch merge_schema still evolves ------------------------

def test_append_merge_schema_empty_batch_evolves(spark, tmp_path):
    d = str(tmp_path / "evolve_empty")
    _corpus(spark, d)
    t = IndexedParquetTable(spark, d, ["k", "v"], catalog=SqliteIndexCatalog())
    empty = (spark.range(1)
             .select(F.col("id").cast("long").alias("k"),
                     F.lit(1).cast("long").alias("v"),
                     F.lit("x").alias("tag"))
             .filter(F.lit(False)))
    n = t.append(empty, merge_schema=True)
    assert n == 0
    # the evolution committed: new column in the schema, reads see it
    assert "tag" in [f.name for f in t._schema.fields]
    out = t.query(col("k") == 3)
    assert "tag" in out.columns
    row = out.head()
    assert row["k"] == 3 and row["tag"] is None


# -- 3. version() propagates transient errors -------------------------

def test_version_missing_table_is_zero_but_locked_raises():
    cat = SqliteIndexCatalog()
    # fresh catalog: table genuinely missing -> 0 (pre-migration)
    assert cat.version() == 0

    real_query = cat._query

    def locked(sql, params=()):
        import sqlite3
        raise sqlite3.OperationalError("database is locked")

    cat._query = locked
    with pytest.raises(Exception, match="locked"):
        cat.version()
    cat._query = real_query


# -- 4. truncated IHDR -> ValueError ----------------------------------

def _png_with_short_ihdr():
    """Well-framed PNG whose IHDR payload is 12 bytes (CRC valid)."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_data = struct.pack(">IIBBBB", 2, 2, 8, 2, 0, 0)  # 12 bytes
    chunks = b""
    for ctype, data in ((b"IHDR", ihdr_data), (b"IDAT", b"x"),
                        (b"IEND", b"")):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        chunks += struct.pack(">I", len(data)) + ctype + data
        chunks += struct.pack(">I", crc)
    return sig + chunks


def test_decode_png_short_ihdr_raises_valueerror():
    with pytest.raises(ValueError, match="malformed IHDR"):
        decode_png(_png_with_short_ihdr())
    # and the round-trip contract is untouched
    import numpy as np
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    w, h, arr = decode_png(encode_png(img))
    assert (w, h) == (3, 2) and (arr == img).all()


# -- 5. with_commit_retries: 3 writers all commit exactly once --------

def test_three_writers_retry_to_success(spark, tmp_path):
    d = str(tmp_path / "retry3")
    _corpus(spark, d)
    cat = SqliteIndexCatalog()
    tables = [IndexedParquetTable(spark, d, ["k", "v"], catalog=cat)
              for _ in range(3)]
    n0 = tables[0].count_rows()
    results, errors = {}, {}
    barrier = threading.Barrier(3)

    def writer(i):
        batch = spark.range(10).select(
            (F.col("id") + 10_000 * (i + 1)).cast("long").alias("k"),
            F.lit(i).cast("long").alias("v"))
        barrier.wait()
        try:
            results[i] = with_commit_retries(
                lambda: tables[i].append(batch), max_attempts=8)
        except Exception as exc:       # pragma: no cover - diagnostics
            errors[i] = exc

    threads = [threading.Thread(target=writer, args=(i,))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert results == {0: 10, 1: 10, 2: 10}
    tables[0].refresh()
    assert tables[0].count_rows() == n0 + 30
    # exactly once: every key landed a single time
    df = tables[0].query(col("k") >= 10_000)
    assert df.count() == 30
    assert df.select("k").distinct().count() == 30
    # version advanced at least once per commit
    assert cat.version() >= 3


def test_with_commit_retries_exhaustion_reraises():
    calls = []

    def always_conflict():
        calls.append(1)
        raise ConcurrentWriteError("catalog version moved")

    with pytest.raises(ConcurrentWriteError):
        with_commit_retries(always_conflict, max_attempts=3,
                            base_delay_s=0.001)
    assert len(calls) == 3


def test_with_commit_retries_other_errors_propagate():
    def boom():
        raise ValueError("not retryable")

    with pytest.raises(ValueError, match="not retryable"):
        with_commit_retries(boom, max_attempts=5)


# -- 6. cosine_pairs bounded-subset guard -----------------------------

def test_cosine_pairs_refuses_large_input(spark):
    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))
    with pytest.raises(ValueError, match="all-pairs baseline"):
        cosine_pairs(emb, max_rows=10)
    # under the cap it still computes (identical vectors -> cosine 1)
    small = emb.filter(F.col("vec_id") < 5)
    out = cosine_pairs(small, threshold=0.99, max_rows=10)
    assert out.count() == 10  # C(5,2) identical vectors
