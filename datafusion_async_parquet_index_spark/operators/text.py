"""Text-analysis operators over the ``documents`` table.

Everything here is pure built-in-function Spark (JVM-side, whole-stage
codegen, zero Python in the hot path): language ID via stopword-hit
heuristic, quality scoring (length / punctuation / stopword ratios),
token counting (whitespace-ish + a BPE-ish regex), and document
fingerprinting (normalized-content hash).  At 100 TB these are
embarrassingly parallel map-only operators — no shuffle at all until an
explicit aggregation.

Each query has an exact DuckDB oracle generated from the same shared
constants (functions/__init__.py), so Spark and the oracle cannot drift.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import (
    BPE_TOKEN_RE, STOPWORDS, TOKEN_SPLIT_RE,
    hash60, norm_text, sql_hash60, sql_norm_text, sql_stopword_list,
    sql_tokens, tokens,
)
from .util import read_table


def text_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: token count, average token length,
    stopword ratio, punctuation ratio, digit ratio. Map-only."""
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_toks = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    punct = F.length(F.regexp_replace(F.col("text"), "[^.,;:!?]", ""))
    digits = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    text_len = F.length(F.col("text"))
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.round(tok_chars / F.greatest(n_toks, F.lit(1)), 4).alias("avg_token_len"),
        F.round(stop_hits / F.greatest(n_toks, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(punct / F.greatest(text_len, F.lit(1)), 4).alias("punct_ratio"),
        F.round(digits / F.greatest(text_len, F.lit(1)), 4).alias("digit_ratio"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: English stopword hit-rate
    over tokens; >= 0.05 => 'en'. Returns the guess next to the labeled
    ``lang`` column for accuracy auditing downstream."""
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) \
        / F.greatest(F.size(toks), F.lit(1))
    guess = F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other"))
    return docs.select(
        "doc_id", "lang",
        guess.alias("lang_guess"),
        F.round(ratio, 4).alias("en_score"),
    )


def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace-ish split and a BPE-ish regex
    (words + isolated non-alphanumerics), aggregated per source."""
    docs = read_table(spark, sf_dir, "documents")
    ws_count = F.size(tokens(F.col("text")))
    bpe_count = F.regexp_count(F.lower(F.col("text")), F.lit(BPE_TOKEN_RE))
    per_doc = docs.select("doc_id", "source", ws_count.alias("ws_tokens"),
                          bpe_count.alias("bpe_tokens"))
    return per_doc.groupBy("source").agg(
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("bpe_tokens").alias("total_bpe_tokens"),
        F.count(F.lit(1)).alias("doc_cnt"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of the normalized text plus a 60-bit
    rolling-hash-style integer fingerprint usable for banding."""
    docs = read_table(spark, sf_dir, "documents")
    normed = norm_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(normed).alias("fingerprint"),
        hash60(normed).alias("fingerprint60"),
    )


def text_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 non-stopword terms per language: explode -> two-phase count
    (map-side combine makes the shuffle (lang, term) partial sums) ->
    per-language ranking window over the tiny aggregated set."""
    from pyspark.sql import Window
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(~F.col("tok").isin(*STOPWORDS))
    counts = tok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tok"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("lang", "tok", "cnt", "rank")
    )


def text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pass, the composed shape a training-data
    pipeline actually runs: quality gate (token count + stopword ratio)
    -> exact dedup (keep lowest doc_id per content hash) -> per-source
    kept-document and kept-token accounting. One window shuffle on the
    content hash, one tiny aggregation — everything else map-only."""
    from pyspark.sql import Window
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_toks = F.size(toks)
    stop_ratio = (F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
                  / F.greatest(n_toks, F.lit(1)))
    gated = (
        docs.select("doc_id", "source", "text", n_toks.alias("n_tokens"),
                    stop_ratio.alias("sr"))
        .filter((F.col("n_tokens") >= 20) & (F.col("sr") >= 0.01))
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (gated.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1))
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum(F.col("n_tokens").cast("bigint")).alias("kept_tokens"),
    )


SAMPLE_PCT = 20          # deterministic 20% sample
TOKEN_BUDGET = 1000      # per-source token budget for packing


def text_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible sampling: keep documents where hash60(doc_id) % 100
    falls under the rate — the same rows on every run, every engine,
    any cluster size (no RNG, no partition-order dependence). Per-source
    counts returned for auditability."""
    docs = read_table(spark, sf_dir, "documents")
    kept = docs.filter(
        hash60(F.col("doc_id").cast("string")) % 100 < SAMPLE_PCT)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("sampled_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


def text_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: take documents per source in doc_id order
    until the running token total exceeds the budget — one ordered
    window per source partition, the shape of dataset-mixing by token
    quota."""
    from pyspark.sql import Window
    docs = read_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(F.col("text")))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = (
        docs.select("doc_id", "source", n_toks.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
    )
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("packed_docs"),
        F.max("cum_tokens").alias("used_tokens"),
    )


STRATUM_FRAC = 10        # exact 10% per stratum (ceil)


def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling: per (source, lang) stratum keep
    exactly ceil(n * frac) documents, chosen by deterministic hash order
    (hash60 of doc_id) — reproducible on any engine and cluster size,
    and every stratum is represented proportionally, unlike a global
    percentage filter whose per-stratum counts fluctuate. One window per
    stratum partition; no collect, no RNG."""
    from pyspark.sql import Window
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(
        hash60(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc())
    ranked = docs.select(
        "doc_id", "source", "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("source", "lang")).alias("n"))
    kept = ranked.filter(
        F.col("rn") <= F.ceil(F.col("n") * STRATUM_FRAC / 100.0))
    return kept.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("sampled_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score — the classic cheap LM
    proxy for training-data filtering: per document,
    score = -avg log p(token) = ln(N) - avg(ln count(token)), under the
    corpus's own unigram distribution. Two-phase shape: corpus term
    counts (map-side combined), joined back onto the exploded tokens —
    a plain hash join on the token, NOT a forced broadcast: the
    vocabulary grows with the corpus (heavy-tail tokens), so at scale
    AQE picks broadcast only while the count table actually fits — then
    one per-doc aggregation. All counts are exact integers; the only
    floats are the final ln/avg, rounded to 4 decimals (double-drift
    across engines is ~1e-12, ten orders below the rounding)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = tc.agg(F.sum("cnt").alias("n_total"))
    per_doc = (
        toks.join(tc, "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.sum(F.log("cnt")).alias("sum_ln_cnt"))
    )
    return (
        per_doc.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.round(
                F.log("n_total") - F.col("sum_ln_cnt") / F.col("n_tokens"),
                4).alias("nll"))
    )


PACK_LEN = 256  # tokens per training sequence


def text_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, GPT-style: documents are concatenated into one
    token stream per source (in doc_id order) and the stream is cut
    into fixed PACK_LEN-token training sequences; documents may span a
    cut. Each doc's starting pack is floor((cum_tokens - n) / L) — a
    single per-source cumulative-sum window, no scan-carried state, so
    the only shuffle is one hash exchange on source and the packing
    survives any scale. Output: per-pack accounting of documents that
    START in the pack and their token mass — what a capacity planner
    reads to size an epoch."""
    from pyspark.sql import Window
    docs = read_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(F.col("text")))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sized = docs.select("doc_id", "source", n_toks.alias("n"))
    adj = sized.withColumn("cum", F.sum("n").over(w))
    out = adj.select(
        "doc_id", "source", "n",
        F.floor((F.col("cum") - F.col("n")) / PACK_LEN)
        .cast("long").alias("pack_id"))
    return (out.groupBy("source", "pack_id")
            .agg(F.count(F.lit(1)).alias("docs_started"),
                 F.sum(F.col("n").cast("bigint")).alias("tokens_started")))


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score — one LM order above
    text_unigram_logprob, the next rung of the CCNet-style quality
    ladder: per document, nll = -avg ln p(tok_i | tok_{i-1}) with
    p = c(bigram) / c(prefix), both counts taken over the corpus's own
    bigram table.  Bigrams are built inside the token array (one
    ``transform`` over index positions — no posexplode + window, so the
    only shuffles are the two count aggregations and the joins back,
    all map-side combinable / AQE-broadcastable exactly like the
    unigram operator).  Counts are exact integers; the only floats are
    the final ln/avg, rounded to 4 decimals.  Documents with fewer than
    2 tokens have no bigrams and drop out (inner-join semantics,
    matching the oracle)."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks"))
    bigram_list = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size("toks")),
            lambda i: F.concat_ws(
                " ", F.get(F.col("toks"), i - 2), F.get(F.col("toks"), i - 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = docs.select("doc_id", F.explode(bigram_list).alias("bg"))
    bc = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt2"))
    # prefix counts derive from the DISTINCT-bigram table, not the raw
    # stream: cnt1(pref) = sum of cnt2 over bigrams sharing the prefix
    # — identical value, but the corpus-sized bigram stream shuffles
    # once (for bc + the final join, one exchange reused) instead of
    # feeding a second full aggregation
    withp = bc.withColumn("pref", F.substring_index("bg", " ", 1))
    pc = withp.groupBy("pref").agg(F.sum("cnt2").alias("cnt1"))
    enriched = withp.join(pc, "pref").select("bg", "cnt2", "cnt1")
    return (
        bg.join(enriched, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(F.avg(F.log("cnt1") - F.log("cnt2")), 4).alias("nll"))
    )


TFIDF_TOPK = 3


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic tf-idf: per document, the top-K terms by
    tf * ln(N / df). Corpus shape: one (doc, term) count aggregate
    (map-side combined), document frequencies derived FROM that table
    (so the raw token stream shuffles once), the scalar N broadcast,
    and one row_number window per document. Ranking and output both use
    the score ROUNDED to 4 decimals with the term as tie-break, so the
    selection is exactly as stable cross-engine as the rounded score
    itself (the same ln-at-4dp contract the LM scorers rely on)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term").crossJoin(F.broadcast(n))
        .withColumn("score", F.round(
            F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOPK)
        .select("doc_id", "term", F.col("tf").cast("bigint").alias("tf"),
                "score", F.col("rn").cast("int").alias("rank"))
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("hash", "scan", "merge")


def text_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed query term set
    — the retrieval scorer a data pipeline uses for query-targeted
    corpus selection: score = sum over query terms of
    idf * tf*(k1+1) / (tf + k1*(1-b + b*len/avglen)), with
    idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the Robertson/Sparck-Jones
    form Lucene uses). All inputs are exact integers (tf, df, N, exact
    doc lengths, avglen as N-scaled exact division); the only
    engine-sensitive op is the final ln/division chain, rounded to 4
    decimals like the LM scorers. Map-side-combined counts + one
    broadcast of the (tiny) per-term stats — no window, no pair join."""
    docs = read_table(spark, sf_dir, "documents")
    # ONE tokenization per document, genuinely: the old shape inlined
    # tokens(text) into both size() and the generator (2 evaluations
    # per doc in one pass) and ran a third corpus tokenize for the
    # length total. A separate projection keeps the non-cheap split
    # from being re-inlined (CollapseProject duplicates only cheap
    # expressions), the query-term restriction moves INSIDE the array
    # before explode — the generator emits ~matched rows instead of
    # every corpus token (guide §2.3: filter before you fan out) —
    # and N + total length fold into one aggregate pass.
    toksed = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    ex = toksed.select(
        "doc_id", F.size("toks").alias("dl"),
        F.explode(F.filter(
            F.col("toks"),
            lambda t: t.isin(*BM25_QUERY))).alias("term"))
    tf = (ex.groupBy("doc_id", "term").agg(
              F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # one combined scalar pass: corpus size and total token length
    nt = toksed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks").cast("bigint")).alias("total_len"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    avglen = F.col("total_len") / F.col("n_docs")
    term_score = idf * (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avglen))
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(nt))
        .select("doc_id", term_score.alias("s"))
    )
    return (
        per_term.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("terms_matched"),
             F.round(F.sum("s"), 4).alias("bm25"))
    )


def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID accuracy audit: the confusion matrix of the langid
    heuristic's guess against the labeled ``lang`` column — counts per
    (labeled, guessed) cell, the readout a pipeline owner checks before
    trusting the classifier for mixture control. One map-side-combined
    aggregate over the same stopword-ratio expression text_langid
    uses."""
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) \
        / F.greatest(F.size(toks), F.lit(1))
    guess = F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other"))
    return (
        docs.select(F.col("lang").alias("labeled"), guess.alias("guessed"))
        .groupBy("labeled", "guessed")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


NGRAM_FEATURE_BUCKETS = 256   # hashing-trick feature space (2^8)


def _bigram_buckets_kernel():
    """Batch-kernel core shared by the feature-hashing rows: maps a
    text to the list of hashed bigram buckets (hash60("w1 w2") %
    NGRAM_FEATURE_BUCKETS, in bigram order). Tokenization replicates
    functions.tokens exactly (lower, split on TOKEN_SPLIT_RE, drop
    empties — all-ASCII after the split, so byte ops are safe) and the
    md5 runs in C hashlib instead of an interpreted JVM
    hash60-per-bigram expression (guide §4.2; parity pinned on the
    full corpus by tests/test_text_kernel_parity.py)."""
    import re
    from hashlib import md5

    split = re.compile(TOKEN_SPLIT_RE)

    def buckets(text):
        if text is None:
            return []
        toks = [t for t in split.split(text.lower()) if t != ""]
        if len(toks) < 2:
            return []
        return [
            (int.from_bytes(
                md5((toks[i] + " " + toks[i + 1]).encode("utf-8"))
                .digest()[:8], "big") >> 4) % NGRAM_FEATURE_BUCKETS
            for i in range(len(toks) - 1)
        ]

    return buckets


def text_hashed_ngram_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bigram features (the fastText input
    representation): every word bigram hashes into a fixed
    NGRAM_FEATURE_BUCKETS-dim space — no vocabulary to build, ship, or
    keep consistent across 100 TB of shards, which is the entire point
    of feature hashing at scale. Output is the corpus feature matrix's
    column profile (per bucket: total occurrences + document
    frequency), i.e. the statistics a linear quality classifier trains
    against. The tokenize+hash runs in one batch kernel that emits
    PRE-AGGREGATED (doc_id, bucket, cnt) rows — each (doc, bucket)
    exactly once, so the shuffle carries at most 256 x docs rows and
    doc_freq is a plain COUNT(*); the md5-per-bigram cost moves from
    interpreted JVM expressions to C hashlib (guide §4.2)."""
    from .util import spread_for_compute

    docs = spread_for_compute(
        read_table(spark, sf_dir, "documents").select("doc_id", "text"))

    def _features(batches):
        import numpy as np
        import pandas as pd

        buckets = _bigram_buckets_kernel()
        nb = NGRAM_FEATURE_BUCKETS
        for pdf in batches:
            per_doc = [buckets(t) for t in pdf["text"]]
            lens = np.fromiter((len(b) for b in per_doc), dtype=np.int64,
                               count=len(per_doc))
            if lens.sum() == 0:
                yield pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int32"),
                    "cnt": pd.Series([], dtype="int64")})
                continue
            ids = pdf["doc_id"].to_numpy()
            # one vectorized (doc, bucket) count over the whole batch:
            # encode pairs as row_index * nb + bucket, np.unique counts
            row_idx = np.repeat(np.arange(len(per_doc)), lens)
            allb = np.concatenate(
                [np.asarray(b, dtype=np.int64) for b in per_doc if b])
            pair, cnt = np.unique(row_idx * nb + allb, return_counts=True)
            yield pd.DataFrame({
                "doc_id": ids[pair // nb],
                "bucket": (pair % nb).astype("int32"),
                "cnt": cnt.astype("int64")})

    feat = docs.mapInPandas(
        _features, schema="doc_id long, bucket int, cnt long")
    return (
        feat.groupBy("bucket")
        .agg(F.sum("cnt").alias("n_grams"),
             F.count(F.lit(1)).alias("doc_freq"))
    )


def _quality_weights() -> list:
    """Deterministic per-bucket weights for the linear quality scorer —
    the stand-in for a trained fastText/CCNet classifier's weight
    vector (integer in [-1000, 1000], derived from the shared hash60
    primitive so both engines agree bit-for-bit)."""
    from ..functions import py_hash60

    return [py_hash60(f"qw|{j}") % 2001 - 1000
            for j in range(NGRAM_FEATURE_BUCKETS)]


def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over hashed bigram features — the
    SCORING half of the fastText/CCNet quality-filter pipeline whose
    feature statistics text_hashed_ngram_features profiles: each
    document's score is the sum of its bigrams' bucket weights
    (hashing trick: no vocabulary shipped, the 256-int weight vector is
    a broadcast literal), and keep = score >= 0 is the filter decision.
    Entirely map-only — the weight lookup rides the same batch kernel
    pass that hashes the bigrams, so scoring 100 TB is one
    zero-shuffle projection. All-integer arithmetic end to end
    (weights, sums, threshold), so the decision boundary is
    bit-deterministic across engines and cluster sizes — a document
    never flips keep/drop between runs, which is what makes quality
    filtering reproducible at corpus scale. The tokenize + md5 +
    weight-sum runs in C hashlib/ints instead of the previous
    interpreted JVM aggregate over a 256-literal weight array
    (guide §4.2; parity pinned against the verbatim expression)."""
    from .util import spread_for_compute

    docs = spread_for_compute(
        read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    weights = _quality_weights()

    def _score(batches):
        import pandas as pd

        buckets = _bigram_buckets_kernel()
        for pdf in batches:
            n_bg, raw = [], []
            for text in pdf["text"]:
                bks = buckets(text)
                n_bg.append(len(bks))
                raw.append(sum(weights[b] for b in bks))
            out = pd.DataFrame({"doc_id": pdf["doc_id"]})
            out["n_bigrams"] = pd.Series(n_bg, dtype="int32")
            out["score_raw"] = pd.Series(raw, dtype="int64")
            out["keep"] = out["score_raw"] >= 0
            yield out

    return docs.mapInPandas(
        _score,
        schema="doc_id long, n_bigrams int, score_raw long, keep boolean")


ZIPF_TOP_TERMS = 100


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus term-frequency distribution — the
    sanity probe that catches boilerplate-flooded or machine-generated
    corpora (natural text fits slope ~ -1): OLS of ln(freq) on ln(rank)
    over the top ZIPF_TOP_TERMS terms. The regression inputs are scaled
    to exact integers (round(ln * 1e6)) BEFORE summation, so every
    accumulator is a BIGINT and the fit is bit-deterministic across
    engines — the only floats are two final divisions, rounded to 6.
    Cost: one term-count aggregate + a 100-row window; the fact stream
    shuffles once."""
    docs = read_table(spark, sf_dir, "documents")
    terms = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    top = (terms.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= ZIPF_TOP_TERMS))
    x = F.round(F.log(F.col("rank").cast("double")) * 1e6).cast("long")
    y = F.round(F.log(F.col("freq").cast("double")) * 1e6).cast("long")
    s = top.select(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n") / F.lit(1e6)
    return s.select(
        F.col("n").cast("int").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("ln_c"))


BPE_PAIR_TOPK = 20


def text_bpe_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE-training primitive: the most frequent ADJACENT symbol
    pair across the corpus — the statistic one merge iteration of
    byte-pair-encoding tokenizer training selects. Symbols here are
    the characters inside each word token (the standard word-internal
    BPE setting), so the pair stream is built with pure array
    expressions — per token, (len-1) adjacent char pairs — exploded
    into ONE map-side-combined count; the shuffle carries (pair,
    partial count), bounded by the symbol-pair alphabet, not corpus
    size. Top pairs by (count desc, pair asc) — the deterministic
    merge-choice order."""
    docs = read_table(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("tok"))
    pair_list = F.when(
        F.length("tok") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.length("tok")),
            lambda i: F.col("tok").substr(i - 1, F.lit(2))),
    ).otherwise(F.array().cast("array<string>"))
    # factor through the token VOCABULARY: identical tokens contribute
    # identical pair lists, so count tokens first (map-side combined;
    # the shuffle carries one row per distinct token) and explode the
    # pairs of each DISTINCT token weighted by its count — exactly the
    # same pair totals with vocab-many substr/explode rows instead of
    # corpus-token-many (measured 0.65 -> 0.34 s at sf0.1; worst case
    # — an all-unique vocabulary — degrades to the original cost plus
    # one combined groupBy)
    vocab = docs.groupBy("tok").agg(F.count(F.lit(1)).alias("tcnt"))
    counts = (vocab.select("tcnt", F.explode(pair_list).alias("pair"))
              .groupBy("pair").agg(F.sum("tcnt").alias("cnt")))
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return (counts.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= BPE_PAIR_TOPK)
            .select("pair", "cnt", "rank"))


LEN_HIST_BASE = 2  # power-of-2 token-length bins


def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable token-length histogram in power-of-2 bins — the
    document-length profile a packing/batching planner reads (and the
    q45 mergeable-sketch posture applied to text): per bin
    [2^k, 2^(k+1)), document count and total tokens. One map-side-
    combined aggregate; bins merge across shards by addition. The bin
    index is exact integer floor(log2) computed by bit length, not
    float log — no boundary hazard."""
    docs = read_table(spark, sf_dir, "documents")
    n = F.size(tokens(F.col("text")))
    # floor(log2(n)) via repeated comparison-free arithmetic:
    # bit_length(n) - 1; Spark has no bit_length for ints, but
    # floor(log2) over the bounded doc-length domain is exact in
    # double for n < 2^49, and n is millions at most — still, avoid
    # the float path entirely with a WIDTH bucket join-free CASE over
    # shifts: k = length(bin(n)) - 1 (bin() renders the binary string)
    k = (F.length(F.conv(n.cast("string"), 10, 2)) - 1).cast("int")
    per_doc = docs.select(n.alias("n_tokens"), k.alias("bin_k")) \
        .filter(F.col("n_tokens") > 0)
    return (
        per_doc.groupBy("bin_k")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"))
        .select("bin_k",
                F.expr("shiftleft(CAST(1 AS BIGINT), bin_k)")
                .alias("bin_lo"),
                "n_docs", "total_tokens")
    )


TEXT_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_quality_metrics": text_quality_metrics,
    "text_langid": text_langid,
    "text_token_counts": text_token_counts,
    "text_fingerprint": text_fingerprint,
    "text_topk_terms": text_topk_terms,
    "text_curation_pipeline": text_curation_pipeline,
    "text_deterministic_sample": text_deterministic_sample,
    "text_token_budget_pack": text_token_budget_pack,
    "text_stratified_sample": text_stratified_sample,
    "text_unigram_logprob": text_unigram_logprob,
    "text_sequence_pack": text_sequence_pack,
    "text_bigram_logprob": text_bigram_logprob,
    "text_tfidf_topk": text_tfidf_topk,
    "text_bm25_score": text_bm25_score,
    "text_lang_confusion": text_lang_confusion,
    "text_hashed_ngram_features": text_hashed_ngram_features,
    "text_quality_classifier": text_quality_classifier,
    "text_zipf_fit": text_zipf_fit,
    "text_bpe_pair_merge": text_bpe_pair_merge,
    "text_length_histogram": text_length_histogram,
}

_TOKS = sql_tokens("text")
_STOPS = sql_stopword_list()

TEXT_ORACLE: Dict[str, str] = {
    "text_quality_metrics": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS INT) AS n_tokens,
               ROUND(CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE)
                     / greatest(len({_TOKS}), 1), 4) AS avg_token_len,
               ROUND(CAST(len(list_filter({_TOKS}, t -> t IN {_STOPS})) AS DOUBLE)
                     / greatest(len({_TOKS}), 1), 4) AS stopword_ratio,
               ROUND(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1), 4) AS punct_ratio,
               ROUND(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1), 4) AS digit_ratio
        FROM documents
    """,
    "text_langid": f"""
        SELECT doc_id, lang,
               CASE WHEN CAST(len(list_filter({_TOKS}, t -> t IN {_STOPS})) AS DOUBLE)
                         / greatest(len({_TOKS}), 1) >= 0.05
                    THEN 'en' ELSE 'other' END AS lang_guess,
               ROUND(CAST(len(list_filter({_TOKS}, t -> t IN {_STOPS})) AS DOUBLE)
                     / greatest(len({_TOKS}), 1), 4) AS en_score
        FROM documents
    """,
    "text_token_counts": f"""
        SELECT source,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS total_ws_tokens,
               CAST(SUM(len(regexp_extract_all(lower(text), '{BPE_TOKEN_RE}')) ) AS BIGINT)
                   AS total_bpe_tokens,
               CAST(COUNT(*) AS BIGINT) AS doc_cnt
        FROM documents GROUP BY source
    """,
    "text_fingerprint": f"""
        SELECT doc_id,
               md5({sql_norm_text('text')}) AS fingerprint,
               {sql_hash60(sql_norm_text('text'))} AS fingerprint60
        FROM documents
    """,
    "text_topk_terms": f"""
        WITH tok AS (
            SELECT lang, unnest({_TOKS}) AS tok FROM documents
        ), f AS (
            SELECT lang, tok, COUNT(*) AS cnt FROM tok
            WHERE tok NOT IN {_STOPS}
            GROUP BY lang, tok
        )
        SELECT lang, tok, CAST(cnt AS BIGINT) AS cnt, rank FROM (
            SELECT lang, tok, cnt,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY cnt DESC, tok ASC) AS INT) AS rank
            FROM f) t
        WHERE rank <= 5
    """,
    "text_curation_pipeline": f"""
        WITH gated AS (
            SELECT doc_id, source, text,
                   CAST(len({_TOKS}) AS INT) AS n_tokens
            FROM documents
            WHERE len({_TOKS}) >= 20
              AND CAST(len(list_filter({_TOKS}, t -> t IN {_STOPS})) AS DOUBLE)
                  / greatest(len({_TOKS}), 1) >= 0.01
        ), deduped AS (
            SELECT source, n_tokens FROM (
                SELECT source, n_tokens,
                       ROW_NUMBER() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn
                FROM gated) t
            WHERE rn = 1
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS kept_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
        FROM deduped GROUP BY source
    """,
    "text_deterministic_sample": f"""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS sampled_docs,
               MIN(doc_id) AS min_doc_id,
               MAX(doc_id) AS max_doc_id
        FROM documents
        WHERE {sql_hash60("doc_id::VARCHAR")} % 100 < {SAMPLE_PCT}
        GROUP BY source
    """,
    "text_token_budget_pack": f"""
        WITH cum AS (
            SELECT doc_id, source,
                   CAST(len({_TOKS}) AS INT) AS n_tokens,
                   SUM(CAST(len({_TOKS}) AS INT)) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS packed_docs,
               CAST(MAX(cum_tokens) AS BIGINT) AS used_tokens
        FROM cum WHERE cum_tokens <= {TOKEN_BUDGET}
        GROUP BY source
    """,
    "text_stratified_sample": f"""
        WITH ranked AS (
            SELECT doc_id, source, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY source, lang
                       ORDER BY {sql_hash60("doc_id::VARCHAR")} ASC,
                                doc_id ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY source, lang) AS n
            FROM documents
        )
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT) AS sampled_docs,
               MIN(doc_id) AS min_doc_id,
               MAX(doc_id) AS max_doc_id
        FROM ranked
        WHERE rn <= CEIL(n * {STRATUM_FRAC} / 100.0)
        GROUP BY source, lang
    """,
}

TEXT_ORACLE["text_unigram_logprob"] = f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), tc AS (
        SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ), total AS (
        SELECT SUM(cnt) AS n_total FROM tc
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INT) AS n_tokens,
           ROUND(ln(n_total) - SUM(ln(cnt)) / COUNT(*), 4) AS nll
    FROM toks JOIN tc USING (tok) CROSS JOIN total
    GROUP BY doc_id, n_total
"""

TEXT_ORACLE["text_lang_confusion"] = f"""
    SELECT lang AS labeled,
           CASE WHEN CAST(len(list_filter({_TOKS}, t -> t IN {_STOPS})) AS DOUBLE)
                     / greatest(len({_TOKS}), 1) >= 0.05
                THEN 'en' ELSE 'other' END AS guessed,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1, 2
"""

TEXT_ORACLE["text_bigram_logprob"] = f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), bg AS (
        SELECT doc_id,
               unnest(list_transform(range(2, len(t) + 1),
                                     i -> t[i - 1] || ' ' || t[i])) AS bg
        FROM toks
    ), bc AS (
        SELECT bg, COUNT(*) AS cnt2 FROM bg GROUP BY bg
    ), pc AS (
        SELECT split_part(bg, ' ', 1) AS pref, COUNT(*) AS cnt1
        FROM bg GROUP BY 1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INT) AS n_bigrams,
           ROUND(AVG(ln(cnt1) - ln(cnt2)), 4) AS nll
    FROM bg
    JOIN bc USING (bg)
    JOIN pc ON split_part(bg.bg, ' ', 1) = pref
    GROUP BY doc_id
"""

TEXT_ORACLE["text_tfidf_topk"] = f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), dfreq AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
        SELECT doc_id, term, tf,
               ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ), r AS (
        SELECT doc_id, term, tf, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term ASC) AS rn
        FROM scored
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score,
           CAST(rn AS INT) AS rank
    FROM r WHERE rn <= {TFIDF_TOPK}
"""

TEXT_ORACLE["text_bm25_score"] = f"""
    WITH lens AS (
        SELECT doc_id, len({_TOKS}) AS dl FROM documents
    ), toks AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks
        WHERE term IN {BM25_QUERY!r} GROUP BY 1, 2
    ), dfreq AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), tot AS (
        SELECT SUM(dl) AS total_len FROM lens
    ), per AS (
        SELECT tf.doc_id,
               ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                 * (tf * {BM25_K1 + 1!r})
                 / (tf + {BM25_K1!r} * ({1 - BM25_B!r}
                    + {BM25_B!r} * dl
                      / (CAST(total_len AS DOUBLE) / n_docs))) AS s
        FROM tf
        JOIN dfreq USING (term)
        JOIN lens ON lens.doc_id = tf.doc_id
        CROSS JOIN n CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS INT) AS terms_matched,
           ROUND(SUM(s), 4) AS bm25
    FROM per GROUP BY doc_id
"""

TEXT_ORACLE["text_sequence_pack"] = f"""
    WITH sized AS (
        SELECT doc_id, source, len({_TOKS}) AS n FROM documents
    ), adj AS (
        SELECT doc_id, source, n,
               SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM sized
    )
    SELECT source, CAST(floor((cum - n) / {PACK_LEN}) AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS docs_started,
           CAST(SUM(n) AS BIGINT) AS tokens_started
    FROM adj GROUP BY 1, 2
"""

TEXT_ORACLE["text_hashed_ngram_features"] = f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), bg AS (
        SELECT doc_id,
               unnest(list_transform(range(2, len(t) + 1),
                                     i -> t[i - 1] || ' ' || t[i])) AS bg
        FROM toks
    )
    SELECT CAST({sql_hash60('bg')} % {NGRAM_FEATURE_BUCKETS} AS INT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM bg GROUP BY 1
"""

_QW = _quality_weights()

TEXT_ORACLE["text_quality_classifier"] = f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), feats AS (
        SELECT doc_id,
               list_transform(range(2, len(t) + 1),
                              i -> t[i - 1] || ' ' || t[i]) AS bgs
        FROM toks
    ), wt AS (
        SELECT {_QW} AS w
    )
    SELECT doc_id,
           CAST(len(bgs) AS INT) AS n_bigrams,
           CAST(COALESCE(list_sum(list_transform(
               bgs,
               bg -> w[CAST({sql_hash60('bg')} % {NGRAM_FEATURE_BUCKETS}
                            AS INT) + 1])), 0) AS BIGINT) AS score_raw,
           COALESCE(list_sum(list_transform(
               bgs,
               bg -> w[CAST({sql_hash60('bg')} % {NGRAM_FEATURE_BUCKETS}
                            AS INT) + 1])), 0) >= 0 AS keep
    FROM feats CROSS JOIN wt
"""

TEXT_ORACLE["text_zipf_fit"] = f"""
    WITH terms AS (
        SELECT unnest({_TOKS}) AS term FROM documents
    ), freqs AS (
        SELECT term, COUNT(*) AS freq FROM terms GROUP BY term
    ), top AS (
        SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC)
                   AS rank
        FROM freqs
        QUALIFY rank <= {ZIPF_TOP_TERMS}
    ), scaled AS (
        SELECT CAST(round(ln(rank) * 1e6) AS BIGINT) AS x,
               CAST(round(ln(freq) * 1e6) AS BIGINT) AS y
        FROM top
    ), s AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM scaled
    )
    SELECT CAST(n AS INT) AS n_terms,
           ROUND((n * sxy - sx * sy)::DOUBLE
                 / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - (n * sxy - sx * sy)::DOUBLE
                       / (n * sxx - sx * sx) * sx) / n / 1e6, 6) AS ln_c
    FROM s
"""

TEXT_ORACLE["text_bpe_pair_merge"] = f"""
    WITH toks AS (
        SELECT unnest({_TOKS}) AS tok FROM documents
    ), pairs AS (
        SELECT unnest(list_transform(range(2, length(tok) + 1),
                                     i -> substr(tok, i - 1, 2))) AS pair
        FROM toks
    ), counts AS (
        SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY pair
    )
    SELECT pair, CAST(cnt AS BIGINT) AS cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS INT)
               AS rank
    FROM counts
    QUALIFY rank <= {BPE_PAIR_TOPK}
"""

TEXT_ORACLE["text_length_histogram"] = f"""
    WITH d AS (
        SELECT len({_TOKS}) AS n FROM documents
    ), binned AS (
        -- bin(n) renders minimal-width binary, so its length - 1 is
        -- exactly floor(log2(n)) — the same bit-length arithmetic the
        -- Spark side gets from conv(n, 10, 2)
        SELECT n, CAST(length(bin(n)) - 1 AS INT) AS bin_k
        FROM d WHERE n > 0
    )
    SELECT bin_k,
           CAST(1::BIGINT << bin_k AS BIGINT) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens
    FROM binned GROUP BY bin_k
"""
