"""Parity pins for the feature-hashing batch kernels (r14 opt).

text_hashed_ngram_features and text_quality_classifier hashed every
word bigram with an interpreted JVM hash60 expression (and, for the
classifier, summed weights through an interpreted aggregate over a
256-literal array). Both now tokenize + md5 + aggregate inside one
mapInPandas batch kernel (_bigram_buckets_kernel). These tests pin the
kernel row-for-row against the verbatim old expression pipelines on
the full corpus plus edge docs — all-integer outputs, so equality is
exact.
"""

from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.functions import hash60, tokens
from datafusion_async_parquet_index_spark.operators import text as T
from datafusion_async_parquet_index_spark.operators.util import read_table

SF = "/root/testdata/sf0.001"


def _expr_bigrams(docs):
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    bigram_list = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size("toks")),
            lambda i: F.concat_ws(
                " ", F.get(F.col("toks"), i - 2),
                F.get(F.col("toks"), i - 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked, bigram_list


def _expr_features(docs):
    toked, bigram_list = _expr_bigrams(docs)
    bg = toked.select("doc_id", F.explode(bigram_list).alias("bg"))
    feat = bg.select(
        "doc_id",
        (hash60(F.col("bg")) % T.NGRAM_FEATURE_BUCKETS).cast("int")
        .alias("bucket"))
    return (
        feat.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.count_distinct("doc_id").alias("doc_freq"))
    )


def _expr_classifier(docs):
    toked, bigram_list = _expr_bigrams(docs)
    wlit = F.array(*[F.lit(w) for w in T._quality_weights()])
    raw = F.aggregate(
        bigram_list, F.lit(0).cast("long"),
        lambda acc, bg: acc + F.element_at(
            wlit,
            (hash60(bg) % T.NGRAM_FEATURE_BUCKETS).cast("int") + 1))
    return toked.select(
        "doc_id",
        F.size(bigram_list).cast("int").alias("n_bigrams"),
        raw.alias("score_raw"),
        (raw >= 0).alias("keep"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_feature_kernel_matches_expression(spark):
    got = _rows(T.text_hashed_ngram_features(spark, SF))
    want = _rows(_expr_features(read_table(spark, SF, "documents")))
    assert got == want
    assert len(got) > 0


def test_classifier_kernel_matches_expression(spark):
    got = _rows(T.text_quality_classifier(spark, SF))
    want = _rows(_expr_classifier(read_table(spark, SF, "documents")))
    assert got == want
    assert len(got) > 0


def test_kernel_edge_docs(spark):
    """Zero-token, one-token, punctuation-only and unicode docs take
    the empty-bigram branch identically on both paths."""
    import pandas as pd

    texts = ["", "word", "...!!!", "one two", "Crème brûlée et café",
             "a b c d e", "UPPER lower 123"]
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(range(len(texts))), "text": texts}))

    buckets = T._bigram_buckets_kernel()
    toked, bigram_list = _expr_bigrams(docs)
    want = {r["doc_id"]: list(r["bg"]) for r in toked.select(
        "doc_id",
        F.transform(
            bigram_list,
            lambda bg: (hash60(bg) % T.NGRAM_FEATURE_BUCKETS).cast("int"))
        .alias("bg")).collect()}
    got = {i: buckets(t) for i, t in enumerate(texts)}
    assert got == want
