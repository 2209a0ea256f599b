"""Streaming incremental dedup: match each arriving micro-batch of
documents against a static corpus signature store.

The production posture for a continuously-fed training corpus: the
corpus's MinHash signatures and band hashes are computed ONCE (at 100 TB
they are a persisted signature table, rebuilt only when the corpus is)
and cached; each micro-batch of new documents is shingled/hashed
map-only at batch size, band-probed into the corpus bands with an
equi-join, and signature-verified on candidates only. Per-batch cost is
O(batch + candidates) — the corpus is never re-read past its one-time
signature pass, and nothing here is stateful streaming state: each new
document's matches depend only on (doc, corpus), so micro-batch
boundaries cannot change the result (asserted by the batch-parity
test).

foreachBatch rather than a stream-static join keeps the per-batch
candidate DISTINCT and verification exactly the batch operator's
semantics (a stream-side dropDuplicates would grow unbounded state);
the sink receives exact per-batch match DataFrames, mirroring
streaming/ingest.py's maintenance posture.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from ..operators.dedup import (
    _band_hashes, _minhash_signatures, match_against_corpus,
)
from ..operators.util import track_cache

DOC_STREAM_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])


def stream_docs_from_dir(spark: SparkSession, dir_path: str) -> DataFrame:
    """File-source stream over a directory of (doc_id, text) parquet
    files — each file is one arriving micro-batch of new documents (the
    local stand-in for the ingest queue; swap ``format`` only)."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir_path)
    )


def corpus_signature_store(corpus_docs: DataFrame):
    """(sigs, bands) for a static corpus, both cached — the in-session
    stand-in for the persisted signature table a deployment keeps next
    to the corpus (reference analogy: the external stats catalog,
    maintained out-of-band of queries)."""
    sigs = track_cache(_minhash_signatures(corpus_docs))
    bands = track_cache(_band_hashes(sigs))
    return sigs, bands


def dedup_against_store_stream(
    new_docs_stream: DataFrame,
    store_dir: str,
    on_matches: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    threshold: float = 0.25,
    trigger_once: bool = True,
    query_name: Optional[str] = None,
):
    """Like ``dedup_against_corpus_stream`` but the corpus side is the
    PERSISTED signature store (operators.dedup.write_signature_store):
    the stream job never touches the raw corpus at all — it reads the
    parquet signature/band tables written at corpus-rebuild time, which
    is the deployment shape at 100 TB (the corpus pass and the ingest
    job are separate lifecycles)."""
    from ..operators.dedup import read_signature_store

    spark = new_docs_stream.sparkSession
    sigs, bands = read_signature_store(spark, store_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        on_matches(
            match_against_corpus(batch_df, sigs, bands, threshold=threshold),
            batch_id)

    w = (new_docs_stream.writeStream
         .outputMode("append")
         .foreachBatch(_sink)
         .option("checkpointLocation", checkpoint_dir))
    if query_name:
        w = w.queryName(query_name)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def dedup_against_corpus_stream(
    new_docs_stream: DataFrame,
    corpus_docs: DataFrame,
    on_matches: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    threshold: float = 0.25,
    trigger_once: bool = True,
    query_name: Optional[str] = None,
):
    """Wire a documents stream into per-batch corpus matching and start
    the query. ``on_matches(matches_df, batch_id)`` receives each
    batch's (new_id, corpus_id, est_jaccard) matches — write them to a
    quarantine table, drop the duplicates, or link them, per policy."""
    sigs, bands = corpus_signature_store(corpus_docs)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        on_matches(
            match_against_corpus(batch_df, sigs, bands, threshold=threshold),
            batch_id)

    w = (new_docs_stream.writeStream
         .outputMode("append")
         .foreachBatch(_sink)
         .option("checkpointLocation", checkpoint_dir))
    if query_name:
        w = w.queryName(query_name)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
