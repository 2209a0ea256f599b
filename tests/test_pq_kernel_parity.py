"""Parity pin for the PQ encoding numpy kernel (r14 opt).

_pq_corpus now assigns codes[m] = argmin_j ||sub(qv,m) - cb[m][j]||^2
in one numpy mapInPandas instead of PQ_M x PQ_K aggregate/zip_with
struct-literal expression trees. The arithmetic is integer-only over
the SQ-quantized domain on both paths, and argmin's first-minimum rule
equals array_min's (dist, j) struct ordering (ties to the lowest j),
so codes must be bit-identical — pinned here against the verbatim old
expression on the full corpus, together with the pass-through columns.
"""

from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.operators import similarity as S
from datafusion_async_parquet_index_spark.operators.util import clear_caches

SF = "/root/testdata/sf0.001"


def _expr_codes(spark):
    """The pre-kernel expression encoding, verbatim."""
    sq = S._sq_corpus(spark, SF)
    dim = S._embedding_dim(sq)
    sd = dim // S.PQ_M
    seeds = [r["qv"] for r in
             sq.orderBy("vec_id").limit(S.PQ_K).select("qv").collect()]
    cb = [[[int(v) for v in s[m * sd:(m + 1) * sd]] for s in seeds]
          for m in range(S.PQ_M)]
    codes = []
    for m in range(S.PQ_M):
        sub = F.slice(F.col("qv"), m * sd + 1, sd)
        dists = F.array(*[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(*[F.lit(v) for v in cb[m][j]]),
                        lambda x, y: (x - y) * (x - y)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("d"),
                F.lit(j).alias("j"))
            for j in range(S.PQ_K)])
        codes.append(F.array_min(dists)["j"])
    return sq.select("vec_id", F.array(*codes).alias("codes")), cb


def test_pq_kernel_codes_match_expression(spark):
    clear_caches()
    kern, cb_k = S._pq_corpus(spark, SF)
    got = {r["vec_id"]: list(r["codes"])
           for r in kern.select("vec_id", "codes").collect()}
    expr_df, cb_e = _expr_codes(spark)
    want = {r["vec_id"]: list(r["codes"]) for r in expr_df.collect()}
    assert cb_k == cb_e
    assert got == want
    assert len(got) > 0


def test_pq_kernel_passthrough_columns_unchanged(spark):
    """The kernel must not perturb the pass-through columns (embedding
    floats bit-preserved through the Arrow round trip, qv/nrm exact)."""
    clear_caches()
    kern, _ = S._pq_corpus(spark, SF)
    base = S._sq_corpus(spark, SF)
    got = {r["vec_id"]: (list(r["embedding"]), r["nrm"], list(r["qv"]))
           for r in kern.select("vec_id", "embedding", "nrm",
                                "qv").collect()}
    want = {r["vec_id"]: (list(r["embedding"]), r["nrm"], list(r["qv"]))
            for r in base.select("vec_id", "embedding", "nrm",
                                 "qv").collect()}
    assert got == want
