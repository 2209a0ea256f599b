"""Parity pin for text_winnow_fingerprint's numpy rewrite (r14 opt).

The operator now (a) reads the hashed k-gram array from the corpus's
shared hashed-shingle artifact (dedup._corpus_hashed — the same
md5-per-shingle pass the MinHash signature / shingle-set caches derive
from) and (b) computes the sliding-window min + distinct-fingerprint
summary vectorized in numpy inside one mapInPandas, instead of the
JVM higher-order-expression form (array_min over an 8-slice per
window, O(windows x w) Catalyst calls per row).

These tests pin the rewrite's two claims:

1. The numpy path reproduces the VERBATIM original Spark-expression
   pipeline row for row on the real corpus (pure int64 mins/distinct —
   no floats, so equality is exact, not tolerance-based).
2. The shared-artifact refactor leaves the derived corpus caches
   (minhash signatures, distinct shingle sets) bit-identical to
   hashing the corpus directly, i.e. _corpus_hashed is a pure
   factoring of the md5 pass, not a semantic change.
"""

from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.functions import (
    MINHASH_P,
    char_shingles,
    hash60,
)
from datafusion_async_parquet_index_spark.operators import dedup as D
from datafusion_async_parquet_index_spark.operators.curation import (
    WINNOW_W,
    text_winnow_fingerprint,
)
from datafusion_async_parquet_index_spark.operators.util import (
    clear_caches,
    read_table,
)

SF = "/root/testdata/sf0.001"


def _winnow_original_expr(spark, sf_dir):
    """The pre-rewrite implementation, verbatim (JVM array exprs)."""
    docs = read_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id",
        F.transform(char_shingles(F.col("text")),
                    lambda s: hash60(s) % MINHASH_P).alias("hs"))
    hs = F.col("hs")
    wins = F.transform(
        F.sequence(F.lit(1),
                   F.greatest(F.lit(1), F.size(hs) - (WINNOW_W - 1))),
        lambda i: F.array_min(F.slice(hs, i, WINNOW_W)))
    winned = hashed.select("doc_id", wins.alias("wins"))
    fps = winned.select("doc_id", "wins",
                        F.array_distinct("wins").alias("fps"))
    return fps.select(
        "doc_id",
        F.size("wins").cast("bigint").alias("n_windows"),
        F.size("fps").cast("bigint").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_winnow_numpy_matches_original_expr(spark):
    clear_caches()
    got = _rows(text_winnow_fingerprint(spark, SF))
    want = _rows(_winnow_original_expr(spark, SF))
    assert got == want
    assert len(got) > 0


def test_winnow_short_and_exact_boundary_docs(spark):
    """Synthetic edge shapes: fewer hashes than one window (the
    slice-of-short-array branch), exactly WINNOW_W, and W+1."""
    import pandas as pd

    texts = [
        (0, "abcd"),              # < shingle width: one "" ... 1 shingle
        (1, "abcdefgh"),          # 4 shingles < W: single window
        (2, "abcdefghijkl"),      # 8 shingles == W: exactly one window
        (3, "abcdefghijklm"),     # 9 shingles: two windows
    ]
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [t[0] for t in texts],
         "text": [t[1] for t in texts]}))
    hashed = docs.select(
        "doc_id",
        F.transform(char_shingles(F.col("text")),
                    lambda s: hash60(s) % MINHASH_P).alias("hs"))

    # run the numpy kernel directly over the same hashed frame
    got = sorted(
        tuple(r) for r in
        hashed.mapInPandas(
            _numpy_kernel(), schema=(
                "doc_id long, n_windows long, n_fingerprints long, "
                "min_fp long, max_fp long")).collect())

    hs = F.col("hs")
    wins = F.transform(
        F.sequence(F.lit(1),
                   F.greatest(F.lit(1), F.size(hs) - (WINNOW_W - 1))),
        lambda i: F.array_min(F.slice(hs, i, WINNOW_W)))
    winned = hashed.select("doc_id", wins.alias("wins"))
    fps = winned.select("doc_id", "wins",
                        F.array_distinct("wins").alias("fps"))
    want = sorted(tuple(r) for r in fps.select(
        "doc_id",
        F.size("wins").cast("bigint").alias("n_windows"),
        F.size("fps").cast("bigint").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp")).collect())
    assert got == want


def _numpy_kernel():
    """Restatement of the operator's mapInPandas kernel for the
    synthetic-docs edge test (the operator itself is corpus-bound via
    _corpus_hashed; the full-corpus test above exercises it end to
    end — this copy lets the same arithmetic run over hand-built
    boundary shapes)."""
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    def _winnow(batches):
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"],
                   "n_windows": [], "n_fingerprints": [],
                   "min_fp": [], "max_fp": []}
            for hs in pdf["hs"]:
                a = np.asarray(hs, dtype=np.int64)
                if a.size >= WINNOW_W:
                    wins = sliding_window_view(a, WINNOW_W).min(axis=1)
                else:
                    wins = a.min(keepdims=True) if a.size else a
                fps = np.unique(wins)
                out["n_windows"].append(wins.size)
                out["n_fingerprints"].append(fps.size)
                out["min_fp"].append(fps[0] if fps.size else None)
                out["max_fp"].append(fps[-1] if fps.size else None)
            yield pd.DataFrame(out)

    return _winnow


def _jvm_hashed(docs):
    """The pre-kernel JVM expression form of _hashed_shingles,
    verbatim: transform(char_shingles, s -> hash60(s) % p)."""
    return docs.select(
        "doc_id",
        F.transform(char_shingles(F.col("text")),
                    lambda s: hash60(s) % MINHASH_P).alias("hs"))


def _jvm_sigs(hashed):
    """The pre-kernel JVM expression form of _sigs_from_hashed,
    verbatim: array_min over (a_i*h + b_i) % p per seed."""
    from datafusion_async_parquet_index_spark.functions import (
        minhash_seed_consts,
    )
    consts = minhash_seed_consts(D.K)

    def seed_sig(i):
        a, b = consts[i]
        return F.array_min(F.transform(
            F.col("hs"), lambda h: (h * F.lit(a) + F.lit(b)) % MINHASH_P))

    return hashed.select(
        "doc_id", *[seed_sig(i).alias(f"s{i}") for i in range(D.K)])


def test_hash_kernel_matches_jvm_expressions(spark):
    """The hashlib mapInPandas kernel == the JVM md5 expression chain
    on the full corpus (bit-exact int64s), and the numpy signature
    kernel == the JVM array_min/transform chain over the same hs."""
    docs = read_table(spark, SF, "documents")
    got_hs = {r["doc_id"]: list(r["hs"])
              for r in D._hashed_shingles(docs).collect()}
    want_hs = {r["doc_id"]: list(r["hs"])
               for r in _jvm_hashed(docs).collect()}
    assert got_hs == want_hs

    hashed = _jvm_hashed(docs)
    assert _rows(D._sigs_from_hashed(hashed)) == _rows(_jvm_sigs(hashed))


def test_hash_kernel_non_ascii_and_short_docs(spark):
    """Normalization forces [a-z0-9 ] ASCII, so the kernel's byte
    slicing == the JVM's character substring — pinned on inputs with
    accents, digits-only, whitespace runs, and empty text."""
    import pandas as pd

    texts = ["Crème BRÛLÉE 42!", "   ", "", "ab", "ßẞ", "a1b2c3",
             "tab\tand\nnewline", "ÅNGSTRÖM units"]
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(range(len(texts))), "text": texts}))
    got = {r["doc_id"]: list(r["hs"])
           for r in D._hashed_shingles(docs).collect()}
    want = {r["doc_id"]: list(r["hs"])
            for r in _jvm_hashed(docs).collect()}
    assert got == want


def test_corpus_hashed_factoring_is_pure(spark):
    """Derived caches from _corpus_hashed == hashing directly."""
    clear_caches()
    direct_sigs = _rows(_jvm_sigs(_jvm_hashed(
        read_table(spark, SF, "documents"))))
    shared_sigs = _rows(D._corpus_sigs(spark, SF))
    assert shared_sigs == direct_sigs

    direct_sets = _rows(read_table(spark, SF, "documents").select(
        "doc_id",
        F.array_distinct(F.transform(
            char_shingles(F.col("text")),
            lambda s: hash60(s) % MINHASH_P)).alias("sh")))
    shared_sets = _rows(D._corpus_shingles(spark, SF))
    assert shared_sets == direct_sets


def test_winnow_null_text_doc_matches_expression(spark):
    """ADVICE r14 #1: a NULL text must yield a row with null summary
    columns (the old expression semantics: slice/len of NULL are
    NULL), not a TypeError in np.asarray. Runs the REAL operator
    kernel (curation._winnow_batches) over _hashed_shingles output,
    which deliberately emits a null hs array for null text."""
    import pandas as pd

    from datafusion_async_parquet_index_spark.operators.curation import (
        _winnow_batches,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2],
                      "text": [None, "abcdefghijklm", None]}),
        schema="doc_id long, text string")
    hashed = D._hashed_shingles(docs)
    got = sorted(
        tuple(r) for r in
        hashed.mapInPandas(_winnow_batches, schema=(
            "doc_id long, n_windows long, n_fingerprints long, "
            "min_fp long, max_fp long")).collect())

    hs_expr = F.transform(char_shingles(F.col("text")),
                          lambda s: hash60(s) % MINHASH_P)
    hashed_expr = docs.select("doc_id", hs_expr.alias("hs"))
    hs = F.col("hs")
    wins = F.transform(
        F.sequence(F.lit(1),
                   F.greatest(F.lit(1), F.size(hs) - (WINNOW_W - 1))),
        lambda i: F.array_min(F.slice(hs, i, WINNOW_W)))
    fps = (hashed_expr.select("doc_id", wins.alias("wins"))
           .select("doc_id", "wins", F.array_distinct("wins").alias("fps")))
    want = sorted(tuple(r) for r in fps.select(
        "doc_id",
        F.size("wins").cast("bigint").alias("n_windows"),
        F.size("fps").cast("bigint").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp")).collect())
    assert got == want
    # the null-text rows follow the old expression semantics — one
    # NULL-shingle window, one distinct fingerprint, null min/max —
    # and are not dropped
    assert got[0] == (0, 1, 1, None, None)
    assert got[2] == (2, 1, 1, None, None)
