"""Property checks for the round-3 curation/ANN additions — invariants
the DuckDB-equality gate cannot express (the oracle agreeing does not
prove the *semantics* are sane, only that both engines agree)."""

import os

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.operators.curation import (
    MIX_BP_DENOM, dedup_substring_ngram, text_domain_mixture, text_pii_scrub,
)
from datafusion_async_parquet_index_spark.operators.similarity import (
    TOPK, sim_bruteforce_topk, sim_sq_topk,
)


def test_pii_scrub_accounting(spark, sf_dir):
    rows = text_pii_scrub(spark, sf_dir).collect()
    assert rows, "documents table empty?"
    total_pii = sum(r.emails + r.ipv4s + r.phones for r in rows)
    assert total_pii > 0, "deterministic injection produced no matches"
    for r in rows:
        assert 0 <= r.docs_with_pii <= r.docs
        # redaction strictly shrinks text when anything matched: every
        # injected span is longer than its replacement token
        if r.emails + r.ipv4s + r.phones > 0:
            assert r.chars_redacted > 0


def test_domain_mixture_rates(spark, sf_dir):
    rows = text_domain_mixture(spark, sf_dir).collect()
    assert rows
    total = sum(r.orig_docs for r in rows)
    target = total // len(rows)
    for r in rows:
        assert 0 < r.rate_bp <= MIX_BP_DENOM
        assert 0 <= r.kept_docs <= r.orig_docs
        # a language already at/below the uniform share is kept whole
        if r.orig_docs <= target:
            assert r.rate_bp == MIX_BP_DENOM
    # downsampling must move the max/min doc-count ratio toward 1
    orig_skew = max(r.orig_docs for r in rows) / max(
        1, min(r.orig_docs for r in rows))
    kept_skew = max(r.kept_docs for r in rows) / max(
        1, min(r.kept_docs for r in rows))
    assert kept_skew <= orig_skew


def test_substring_ngram_coverage_bounds(spark, sf_dir):
    rows = dedup_substring_ngram(spark, sf_dir).collect()
    assert rows
    assert any(r.n_dup > 0 for r in rows), \
        "corpus has near-duplicates; 8-gram overlap should be nonzero"
    for r in rows:
        assert r.n_grams >= 1
        assert 0 <= r.n_dup <= r.n_grams
        assert 0.0 <= r.dup_coverage <= 1.0


def test_sq_topk_shape_and_recall(spark, sf_dir):
    sq = sim_sq_topk(spark, sf_dir).collect()
    exact = sim_bruteforce_topk(spark, sf_dir).collect()
    per_q = {}
    for r in sq:
        per_q.setdefault(r.query_id, set()).add(r.cand_id)
    exact_q = {}
    for r in exact:
        exact_q.setdefault(r.query_id, set()).add(r.cand_id)
    assert set(per_q) == set(exact_q), "same query set as brute force"
    hits = total = 0
    for qid, cands in per_q.items():
        assert len(cands) == TOPK
        hits += len(cands & exact_q[qid])
        total += TOPK
    # int8 quantization with a 4x candidate pool loses little: demand
    # high (not perfect — it IS approximate) agreement with exact top-k
    assert hits / total >= 0.8, f"recall@{TOPK} = {hits / total:.2f}"
