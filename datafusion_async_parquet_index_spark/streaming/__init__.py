from .events_stream import (
    asof_join_stream, dedup_stream, interval_join_stream,
    sessionize_stream, sliding_counts_stream, stream_events_from_dir,
    tumbling_counts_stream,
)
from .incremental_dedup import (
    corpus_signature_store, dedup_against_corpus_stream,
    dedup_against_store_stream,
)
from .ingest import (
    indexed_ingest_sink, ingest_stream_to_indexed_table,
    partitioned_ingest_sink,
)

__all__ = [
    "stream_events_from_dir", "tumbling_counts_stream",
    "sliding_counts_stream", "sessionize_stream", "dedup_stream",
    "asof_join_stream", "indexed_ingest_sink",
    "ingest_stream_to_indexed_table", "partitioned_ingest_sink",
    "interval_join_stream", "corpus_signature_store",
    "dedup_against_corpus_stream", "dedup_against_store_stream",
]
