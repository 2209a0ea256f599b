"""Parity pins for dedup_semantic's matmul direct path (r14 opt).

The direct branch now computes within-cluster pair cosines as one
blocked numpy matmul per cluster instead of a salted O(cluster²) pair
join + window. These tests pin the two claims that rewrite rests on:

1. The matmul path reproduces the ORIGINAL Spark-expression pair join
   (F.round(dot_double/(un*vn), 6), keep-lowest-anchor window) row for
   row on the real corpus.
2. Why the two rounding implementations cannot disagree here: every
   within-cluster pair cosine sits far (>= 1e-12 in cosine units, i.e.
   >= 1e-6 fractional units after scaling by 1e6) from the nearest
   6-decimal half boundary, and the numpy float emulation
   sign*floor(|c|*1e6+0.5)/1e6 equals BigDecimal-style HALF_UP
   (Decimal(repr(c)), Spark's Double.toString semantics) on each.
"""

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.functions import dot_double
from datafusion_async_parquet_index_spark.operators import dedup as D
from datafusion_async_parquet_index_spark.operators.joins import salted_join
from datafusion_async_parquet_index_spark.operators.util import (
    clear_caches,
    session_memo,
)

SF = "/root/testdata/sf0.001"


def _assigned(spark):
    """Run the operator once, then reuse ITS cluster-assignment frame
    (the session memo) so both paths compare over identical input."""
    D.dedup_semantic(spark, SF)
    return session_memo(spark, "dedup_corpus")[(SF, "semantic_assigned")]


def _original_direct(assigned):
    """The pre-r14 direct branch, verbatim."""
    a = assigned.select(F.col("vec_id").alias("u"), "cid",
                        F.col("embedding").alias("ue"),
                        F.col("nrm").alias("un"))
    b = assigned.select(F.col("vec_id").alias("v"), "cid",
                        F.col("embedding").alias("ve"),
                        F.col("nrm").alias("vn"))
    cos_d = F.round(dot_double(F.col("ue"), F.col("ve"))
                    / (F.col("un") * F.col("vn")), 6)
    pairs = (salted_join(a, b, on="cid", n_salts=8)
             .filter(F.col("u") < F.col("v"))
             .select("cid", "u", "v", cos_d.alias("cosine"))
             .filter(F.col("cosine") >= D.SEMDEDUP_TAU))
    w2d = Window.partitionBy("v").orderBy("u")
    return (
        pairs.withColumn("rn", F.row_number().over(w2d))
        .filter(F.col("rn") == 1)
        .select(F.col("v").alias("dup_id"),
                F.col("cid").cast("bigint").alias("cluster"),
                F.col("u").alias("kept_id"), "cosine")
    )


def test_matmul_direct_equals_original_expression(spark, monkeypatch):
    monkeypatch.setitem(D._COLLAPSE_STATS,
                        D._collapse_key(SF, "emb"), 1.0)  # force direct
    clear_caches()
    new = sorted(tuple(r) for r in D.dedup_semantic(spark, SF).collect())
    old = sorted(tuple(r)
                 for r in _original_direct(_assigned(spark)).collect())
    clear_caches()
    assert new, "corpus must contain semantic near-dups"
    assert new == old


def test_rounding_boundary_margin(spark, monkeypatch):
    monkeypatch.setitem(D._COLLAPSE_STATS,
                        D._collapse_key(SF, "emb"), 1.0)
    clear_caches()
    assigned = _assigned(spark)
    a = assigned.select(F.col("vec_id").alias("u"), "cid",
                        F.col("embedding").alias("ue"),
                        F.col("nrm").alias("un"))
    b = assigned.select(F.col("vec_id").alias("v"), "cid",
                        F.col("embedding").alias("ve"),
                        F.col("nrm").alias("vn"))
    raw = (dot_double(F.col("ue"), F.col("ve"))
           / (F.col("un") * F.col("vn")))
    vals = [r[0] for r in
            a.join(b, "cid").filter(F.col("u") < F.col("v"))
            .select(raw.alias("c")).collect()]
    clear_caches()
    assert len(vals) > 100
    q6 = Decimal("0.000001")
    for c in vals:
        frac = abs(c) * 1e6
        # distance to the half-up boundary, in cosine units
        margin = abs(frac - math.floor(frac) - 0.5) / 1e6
        assert margin >= 1e-12, (c, margin)
        np_style = math.copysign(math.floor(frac + 0.5) / 1e6, c)
        dec_style = float(Decimal(repr(c)).quantize(q6, ROUND_HALF_UP))
        assert np_style == dec_style, (c, np_style, dec_style)
