"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY §2.5: streaming entirely absent), so
this module is pure extension: the same event-analytics semantics as
``operators/events.py`` expressed as streams — ``readStream`` sources,
watermarks for late data, tumbling-window aggregation, and gap-based
sessionization via ``applyInPandasWithState`` (the custom-stateful-
operator escape hatch).

Scale posture: windowed aggregation state is (window x type) rows —
bounded by the watermark horizon; sessionization state is one row per
active user, dropped on timeout. Both shapes run unchanged on a real
cluster with a durable checkpoint location.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", LongType()),  # epoch nanos (nanosAsLong read)
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
])

SESSION_GAP_SEC = 1800


def stream_events_from_dir(spark: SparkSession, dir_path: str) -> DataFrame:
    """File-source stream over a directory of event parquet files —
    each new file becomes a micro-batch (the local stand-in for a
    Kafka/queue source; swap ``format`` only)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir_path)
        .withColumn("event_ts", F.timestamp_seconds(
            F.floor(F.col("ts") / F.lit(1_000_000_000))))
    )


def tumbling_counts_stream(
    events: DataFrame, window_sec: int = 300, watermark_sec: int = 3600
) -> DataFrame:
    """Tumbling-window count/sum per event type with a late-data
    watermark — the streaming twin of operators.events.ev_tumbling_agg;
    on identical input the results must match the batch form exactly."""
    return (
        events.withWatermark("event_ts", f"{watermark_sec} seconds")
        .groupBy(
            F.window(F.col("event_ts"), f"{window_sec} seconds").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type", "cnt",
        )
    )


def sliding_counts_stream(
    events: DataFrame, window_sec: int = 600, slide_sec: int = 300,
    watermark_sec: int = 3600,
) -> DataFrame:
    """Sliding-window count per event type (streaming twin of
    operators.events.ev_sliding_agg): every event lands in
    window_sec/slide_sec overlapping windows, expanded map-side by the
    native window() operator; watermark bounds the state."""
    return (
        events.withWatermark("event_ts", f"{watermark_sec} seconds")
        .groupBy(
            F.window(F.col("event_ts"), f"{window_sec} seconds",
                     f"{slide_sec} seconds").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type", "cnt",
        )
    )


def dedup_stream(
    events: DataFrame, key_cols=("event_id",), watermark_sec: int = 3600,
) -> DataFrame:
    """Streaming exactly-once dedup: drop re-deliveries of the same key
    within the watermark horizon — the standard at-least-once ->
    exactly-once ingestion repair for a training-data feed.

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+), NOT plain
    ``dropDuplicates``: with a key subset that excludes the event-time
    column, plain dropDuplicates ignores the watermark for state cleanup
    and per-key state grows without bound on a real stream.  The
    WithinWatermark variant evicts each key's state once the watermark
    passes its first-seen event time, so state is bounded by (keys seen
    within the horizon) — the semantics this operator claims.  A
    re-delivery later than the horizon is re-emitted (duplicate-within-
    watermark semantics); horizon-free global dedup at scale belongs in
    the batch layer (operators.dedup.dedup_exact)."""
    return (
        events.withWatermark("event_ts", f"{watermark_sec} seconds")
        .dropDuplicatesWithinWatermark(list(key_cols))
    )


_SESSION_STATE_SCHEMA = StructType([
    StructField("session_start_sec", LongType()),
    StructField("last_seen_sec", LongType()),
    StructField("n_events", LongType()),
    StructField("n_sessions", LongType()),
])

_SESSION_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("session_events", LongType()),
    StructField("session_start_sec", LongType()),
    StructField("session_end_sec", LongType()),
])


def _make_sessionize_fn(gap_sec: int, timeout_ms: int):
    cols = [f.name for f in _SESSION_OUT_SCHEMA]

    def _fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-user gap sessionizer: emits a row per CLOSED session; open
        sessions stay in state until the gap or the timeout closes them.
        Events arriving out of order across micro-batches only extend the
        current session (production deployments should pre-sort within a
        watermark; this operator never crashes on disorder)."""
        (user_id,) = key
        if state.exists:
            start, last, n_events, n_sessions = state.get
        else:
            start = last = None
            n_events = 0
            n_sessions = 0

        if state.hasTimedOut:
            out = []
            if n_events:
                n_sessions += 1
                out.append((user_id, n_sessions, n_events, start, last))
            state.remove()
            yield pd.DataFrame(out, columns=cols)
            return

        rows = []
        for pdf in pdfs:
            for sec in sorted(int(s) for s in pdf["sec"].tolist()):
                if last is not None and sec - last > gap_sec:
                    n_sessions += 1
                    rows.append((user_id, n_sessions, n_events, start, last))
                    start, n_events = sec, 0
                if start is None:
                    start = sec
                if last is None or sec > last:
                    last = sec
                if sec < start:  # out-of-order arrival: extend backwards
                    start = sec
                n_events += 1
        state.update((start, last, n_events, n_sessions))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(rows, columns=cols)

    return _fn


_ASOF_STATE_SCHEMA = StructType([
    StructField("last_click_ts", LongType()),
    StructField("last_click_id", LongType()),
])

_ASOF_OUT_SCHEMA = StructType([
    StructField("purchase_id", LongType()),
    StructField("user_id", LongType()),
    StructField("last_click_id", LongType()),
])


def _make_asof_fn():
    cols = [f.name for f in _ASOF_OUT_SCHEMA]

    def _fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, last_id = state.get
        else:
            last_ts = last_id = None
        rows = []
        evs = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                side = 0 if r.event_type == "click" else 1
                evs.append((int(r.ts), side, int(r.event_id)))
        # same order as the batch window: ts, then click-before-purchase,
        # then event_id — equal-ts clicks resolve to the highest id and a
        # click at the purchase's exact ts counts
        evs.sort()
        for ts, side, eid in evs:
            if side == 0:
                if last_ts is None or (ts, eid) > (last_ts, last_id):
                    last_ts, last_id = ts, eid
            else:
                rows.append((eid, user_id, last_id))
        if last_ts is not None:
            state.update((last_ts, last_id))
        yield pd.DataFrame(rows, columns=cols)

    return _fn


def asof_join_stream(events: DataFrame) -> DataFrame:
    """Streaming as-of join — the streaming twin of
    ``queries.q20_asof_join``: for every purchase event, emit the user's
    most recent click at-or-before the purchase timestamp (NULL when no
    click yet).  This is the online point-in-time feature-join shape:
    the click stream continuously updates per-user state, purchases read
    it.

    Custom stateful operator (``applyInPandasWithState``) keyed by user:
    state is ONE (last_click_ts, last_click_id) row per user ever seen —
    the standard per-entity feature-store state shape; at cluster scale
    it lives in the state store (RocksDB) partitioned by user_id, no
    shuffle beyond the groupBy.  Within a micro-batch events are
    processed in (ts, side, id) order so batch parity is exact on a
    per-user-ordered feed; a click delivered AFTER a later-ts purchase
    (cross-batch disorder) cannot retroactively repair that purchase —
    bound disorder upstream with a watermarked re-order or accept the
    online approximation."""
    prepared = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select("event_id", "ts", "user_id", "event_type")
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_asof_fn(),
        outputStructType=_ASOF_OUT_SCHEMA,
        stateStructType=_ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


INTERVAL_JOIN_SEC = 60
INTERVAL_JOIN_WATERMARK = "10 minutes"


def interval_join_stream(
    events: DataFrame, interval_sec: int = INTERVAL_JOIN_SEC,
) -> DataFrame:
    """Stream-stream self join with a time-interval condition — the
    streaming twin of ``operators.events.ev_interval_join``'s pair
    stage: emit (event, other) for every pair of a user's events within
    ±interval_sec of each other.  This is Spark's native stream-stream
    join: both sides carry a watermark and the join condition bounds
    event time in BOTH directions, so the state store provably evicts
    rows once the watermark passes their join horizon — state is
    O(events inside the watermark window), not O(stream).  At cluster
    scale the join is a hash equi-join on user_id with the interval as
    a post-condition, RocksDB-backed state, no custom operator code."""
    l = (events.select(
            F.col("event_id").alias("l_id"), F.col("user_id").alias("l_uid"),
            F.col("event_ts").alias("l_ts"))
         .withWatermark("l_ts", INTERVAL_JOIN_WATERMARK))
    r = (events.select(
            F.col("event_id").alias("r_id"), F.col("user_id").alias("r_uid"),
            F.col("event_ts").alias("r_ts"))
         .withWatermark("r_ts", INTERVAL_JOIN_WATERMARK))
    return l.join(
        r,
        F.expr(f"""
            l_uid = r_uid AND l_id != r_id AND
            r_ts BETWEEN l_ts - INTERVAL {interval_sec} SECONDS
                     AND l_ts + INTERVAL {interval_sec} SECONDS
        """),
    ).select(
        F.col("l_id").alias("event_id"), F.col("l_uid").alias("user_id"),
        F.col("r_id").alias("other_id"),
        F.unix_timestamp("l_ts").alias("sec"),
        F.unix_timestamp("r_ts").alias("other_sec"),
    )


def session_window_counts_stream(
    events: DataFrame, gap_sec: int = SESSION_GAP_SEC,
    watermark_sec: int = 0,
) -> DataFrame:
    """Gap sessionization via Spark's NATIVE streaming session_window
    — no custom operator code at all: the state store holds open
    session windows per user, merges them as events arrive, and emits
    a (user, session) row once the watermark passes the session's
    close. session_window's merge bound is inclusive (gap == gap_sec
    merges, gap_sec+1 splits — see
    operators.events.ev_session_window_agg), which is exactly the
    batch lag-formulation's gap > gap_sec new-session convention."""
    return (
        events.withWatermark("event_ts", f"{watermark_sec} seconds")
        .groupBy(
            "user_id",
            F.session_window("event_ts", f"{gap_sec} seconds"),
        )
        .agg(F.count(F.lit(1)).alias("session_events"))
        .select("user_id", "session_events")
    )


def _make_sessionize_event_time_fn(gap_sec: int):
    """Per-user gap sessionizer with EVENT-TIME session close: a session
    is emitted exactly when the stream can PROVE it is over — either a
    same-user event beyond the gap arrives (data-driven close), or the
    event-time watermark passes ``last_seen + gap`` with no such event
    (timeout-driven close).  Unlike the processing-time variant
    (``_make_sessionize_fn``), no wall-clock enters the semantics, so
    the emitted session set is a deterministic function of the input —
    which is what lets the result face a relational oracle.  State is
    removed on close: bounded by ACTIVE users, the production posture
    (session ordinals, if needed downstream, come from a batch-layer
    renumber, not from unbounded per-user counters)."""
    cols = [f.name for f in _SESSION_OUT_SCHEMA]

    def _fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n_events, n_closed = state.get
        else:
            start = last = None
            n_events = 0
            n_closed = 0

        if state.hasTimedOut:
            out = []
            if n_events:
                out.append((user_id, n_closed + 1, n_events, start, last))
            state.remove()
            yield pd.DataFrame(out, columns=cols)
            return

        rows = []
        for pdf in pdfs:
            for sec in sorted(int(s) for s in pdf["sec"].tolist()):
                if last is not None and sec - last > gap_sec:
                    n_closed += 1
                    rows.append((user_id, n_closed, n_events, start, last))
                    start, n_events = sec, 0
                if start is None:
                    start = sec
                if last is None or sec > last:
                    last = sec
                if sec < start:  # out-of-order arrival: extend backwards
                    start = sec
                n_events += 1
        state.update((start, last, n_events, n_closed))
        # close when the watermark proves no in-gap event can still come
        state.setTimeoutTimestamp((last + gap_sec) * 1000 + 1000)
        yield pd.DataFrame(rows, columns=cols)

    return _fn


def sessionize_event_time_stream(
    events: DataFrame, gap_sec: int = SESSION_GAP_SEC,
    watermark_sec: int = 0,
) -> DataFrame:
    """Gap sessionization as a custom stateful operator whose session
    CLOSE is driven by the event-time watermark (EventTimeTimeout) —
    deterministic on a replayed feed, late-data-tolerant up to
    ``watermark_sec`` on a live one.  One state row per ACTIVE user,
    removed at close; at cluster scale the state lives in the
    RocksDB-backed store partitioned by user_id."""
    prepared = events.select(
        "user_id",
        F.col("event_ts"),
        F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("long").alias("sec"),
    ).withWatermark("event_ts", f"{watermark_sec} seconds")
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_sessionize_event_time_fn(gap_sec),
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = SESSION_GAP_SEC,
    timeout_ms: int = SESSION_GAP_SEC * 1000,
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator
    (applyInPandasWithState): one state row per active user, dropped on
    processing-time timeout."""
    prepared = events.select(
        "user_id",
        F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("long").alias("sec"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_sessionize_fn(gap_sec, timeout_ms),
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
