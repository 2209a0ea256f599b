"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the external-index pruned scan + aggregation
(reference demo Q3 shape) on /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 (+ the training-data pipeline operators), checked
against DuckDB at sf=0.01 by the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datafusion_async_parquet_index_spark.queries import q3_or_range_agg

    return q3_or_range_agg(spark, "/root/testdata/sf0.001")


# The driver's CORRECTNESS gate records only the FIRST 50 entries of
# ``queries()`` in iteration order.  With 78+ registered queries the
# order below decides which operators get a driver oracle row this
# round (VERDICT r2 ask #1).  Priority:
#   1. operators never driver-verified in any round (r1/r2 gap),
#   2. operators whose modules changed since their last green row,
#   3. freshly re-verified (r2-green) entries, relational tail last.
# Rotate tiers between rounds so every entry eventually gets a row.
_ROUND_PRIORITY = [
    # -- tier 1: never driver-verified (21 entries) ------------------
    "ev_tumbling_agg",
    "ev_sliding_agg",
    "ev_sessionize",
    "ev_type_funnel",
    "ev_cms_user_counts",
    "ev_json_extract",
    "ev_retention",
    "ev_anomaly",
    "mm_metadata_extract",
    "mm_frame_sample_stats",
    "mm_feature_extract",
    "mm_modality_stats",
    "mm_resize_stats",
    "dedup_verified_clusters",
    "dedup_incremental",
    "dedup_incremental_persisted",
    "dedup_embedding_lsh",
    "dedup_containment",
    "dedup_keep_policy",
    "sim_ivf_nprobe_topk",
    "sim_ivf_layout_topk",
    # -- tier 2: green in r1 only; modules changed since (10) --------
    "dedup_cross_modal",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "sim_bruteforce_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "emb_label_centroids",
    # -- tier 3: NEW in round 3 (never had a driver row) ------------
    "text_pii_scrub",
    "text_domain_mixture",
    "dedup_substring_ngram",
    "sim_sq_topk",
    "q38_exists_subquery",
    "q39_grouping_sets",
    "q40_range_frame",
    "q41_pivot",
    "ev_interval_join",
    "dedup_minhash_quality",
    "text_quality_buckets",
    "q42_hll_estimate",
    "q43_in_pred",
    "sim_recall_report",
    "text_winnow_fingerprint",
    "dedup_contamination",
    "text_repetition_stats",
    # -- tier 4: r2-green entries whose modules changed this round
    #    (dedup store persistence, queries.py additions, pruning/CASE,
    #    events zero-guard) ------------------------------------------
    # dedup_exact / dedup_minhash_lsh / dedup_verified_pairs /
    # q2_point_equality rotate out: bodies untouched since their
    # r2-green rows, and their machinery is pinned transitively by
    # in-window entries (verified_clusters calls corpus_verified_pairs;
    # q35's fully-covered files route through the native q2 path;
    # minhash_quality re-verifies the signature family)
    "q35_rowgroup_scan",
    "q37_case_pred",
    # q20_asof_join rotates out: body untouched since its r2-green row
    # and the events-timestamp dispatch it depends on is pinned by the
    # nine in-window ev_* entries
    # The r2-green text_* family and the untouched-body relational
    # queries (q1..q34, q36) rotate OUT this round: their modules'
    # changes are purely additive, while everything above either never
    # had a row or had its code path touched. Remaining entries append
    # in natural order below.
    # Added late in round 3 (after the 50 window was already full) and
    # FIRST in line for the r4 window: q44_isnull_pred,
    # q45_binned_quantiles, q46_partitioned_scan, q47_zorder_scan,
    # q48_metadata_count, text_bigram_logprob, ev_attribution,
    # emb_kmeans_step, text_tfidf_topk, text_bm25_score,
    # q49_token_search, q50_join_pruned_scan, dedup_snapshot_diff,
    # ev_funnel_ordered, ev_markov_transitions,
    # q51_partition_group_count, q52_metadata_minmax,
    # text_lang_confusion — all local-harness green at BOTH sf0.01
    # and sf0.1.
]


def _prioritize(entries: dict) -> dict:
    ordered = {k: entries[k] for k in _ROUND_PRIORITY if k in entries}
    for k, v in entries.items():
        if k not in ordered:
            ordered[k] = v
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datafusion_async_parquet_index_spark.queries import RELATIONAL_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(RELATIONAL_QUERIES)
    try:
        from datafusion_async_parquet_index_spark.operators import (
            PIPELINE_QUERIES,
        )
        out.update(PIPELINE_QUERIES)
    except ImportError:
        pass
    return _prioritize(out)


def oracle_sql() -> dict[str, str]:
    from datafusion_async_parquet_index_spark.queries import RELATIONAL_ORACLE

    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLE)
    try:
        from datafusion_async_parquet_index_spark.operators import (
            PIPELINE_ORACLE,
        )
        out.update(PIPELINE_ORACLE)
    except ImportError:
        pass
    return _prioritize(out)
