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


def test_domain_mixture_explicit_weights(spark, sf_dir):
    """Weighted form: kept counts must track total*weight targets (up to
    the hash-sample's binomial noise) and the downsample-only cap."""
    from datafusion_async_parquet_index_spark.operators.curation import (
        domain_mixture,
    )
    from datafusion_async_parquet_index_spark.operators.util import read_table

    docs = read_table(spark, sf_dir, "documents")
    weights = {"en": 5000, "de": 2500, "zh": 2500}  # fr/es -> weight 0
    rows = {r.lang: r for r in domain_mixture(docs, "lang", weights).collect()}
    assert rows["fr"].rate_bp == 0 and rows["fr"].kept_docs == 0
    assert rows["es"].kept_docs == 0
    total = sum(r.orig_docs for r in rows.values())
    for lang, bp in weights.items():
        r = rows[lang]
        target = min(r.orig_docs, total * bp // 10_000)
        # binomial sd ~ sqrt(n)/2; allow 4 sd + rounding slack
        slack = 4 * max(1, int(r.orig_docs ** 0.5)) + 2
        assert abs(r.kept_docs - target) <= slack, (lang, r, target)


def test_substring_ngram_coverage_bounds(spark, sf_dir):
    rows = dedup_substring_ngram(spark, sf_dir).collect()
    assert rows
    assert any(r.n_dup > 0 for r in rows), \
        "corpus has near-duplicates; 8-gram overlap should be nonzero"
    for r in rows:
        assert r.n_grams >= 1
        assert 0 <= r.n_dup <= r.n_grams
        assert 0.0 <= r.dup_coverage <= 1.0


def test_interval_join_pair_symmetry(spark, sf_dir):
    from datafusion_async_parquet_index_spark.operators.events import (
        ev_interval_join,
    )
    rows = ev_interval_join(spark, sf_dir).collect()
    assert rows, "no events within ±60s of another of the same user?"
    assert all(r.n_nearby >= 1 for r in rows)
    # |t_a - t_b| <= 60 is symmetric: every unordered pair contributes
    # one count to each side, so the grand total must be even
    assert sum(r.n_nearby for r in rows) % 2 == 0


def test_minhash_quality_calibration(spark, sf_dir):
    from datafusion_async_parquet_index_spark.operators.dedup import (
        corpus_minhash_pairs, dedup_minhash_quality,
    )
    rows = dedup_minhash_quality(spark, sf_dir).collect()
    assert rows
    n_pairs = sum(r.n_pairs for r in rows)
    assert n_pairs == corpus_minhash_pairs(spark, sf_dir, 0.25).count(), \
        "calibration must cover every candidate pair exactly once"
    for r in rows:
        assert 0 <= r.bin <= 10
        assert r.sum_abs_err_bp >= 0
    # K=24 signatures: per-pair sigma ~ sqrt(J(1-J)/24) <= 0.102; the
    # mean |error| across all candidates should sit well inside 3 sigma
    mae = sum(r.sum_abs_err_bp for r in rows) / n_pairs / 10_000
    assert mae <= 0.3, f"minhash estimator MAE {mae:.3f} looks broken"


def test_quality_buckets_shape(spark, sf_dir):
    from datafusion_async_parquet_index_spark.operators.curation import (
        N_QUALITY_BUCKETS, text_quality_buckets,
    )
    rows = text_quality_buckets(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, buckets in by_lang.items():
        # NTILE emits fewer buckets than N for groups smaller than N
        n_docs = sum(b.n_docs for b in buckets.values())
        expect = min(n_docs, N_QUALITY_BUCKETS)
        assert set(buckets) == set(range(1, expect + 1))
        counts = [buckets[b].n_docs for b in sorted(buckets)]
        # NTILE: bucket sizes differ by at most one, non-increasing
        assert max(counts) - min(counts) <= 1
        assert counts == sorted(counts, reverse=True)
        for b in range(1, expect):  # only buckets that exist
            assert buckets[b].max_nll <= buckets[b + 1].min_nll


def test_winnow_density_guarantee(spark, sf_dir):
    """Winnowing invariants: at least one fingerprint per w windows
    (every window contributes its min; distinct collapses runs), and
    the expected density ~2/(w+1) of windows — allow a wide band."""
    from datafusion_async_parquet_index_spark.operators.curation import (
        WINNOW_W, text_winnow_fingerprint,
    )
    rows = text_winnow_fingerprint(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_fingerprints <= r.n_windows
        assert r.min_fp <= r.max_fp
    # density: winnowing selects ~2/(w+1) of windows as distinct minima
    # in expectation; assert the corpus-wide average sits in a wide band
    # around it (per-doc counts can collapse on repetitive text)
    dens = sum(r.n_fingerprints for r in rows) / sum(r.n_windows for r in rows)
    expect = 2 / (WINNOW_W + 1)
    assert expect / 3 <= dens <= 3 * expect, dens


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


def test_gopher_filter_flags_are_consistent(spark, sf_dir):
    """Per-language rule rollup invariants: pass_all can never exceed
    n_docs minus the largest single-rule failure count, every count is
    bounded by n_docs, and the language totals cover the corpus."""
    from datafusion_async_parquet_index_spark.operators.curation import (
        text_gopher_filter,
    )
    from datafusion_async_parquet_index_spark.operators.util import read_table

    rows = text_gopher_filter(spark, sf_dir).collect()
    assert rows
    total = 0
    for r in rows:
        total += r.n_docs
        fails = [r.fail_word_count, r.fail_mean_word_len,
                 r.fail_alpha_frac, r.fail_stopwords]
        for f in fails:
            assert 0 <= f <= r.n_docs
        assert 0 <= r.pass_all <= r.n_docs - max(fails)
    assert total == read_table(spark, sf_dir, "documents").count()
