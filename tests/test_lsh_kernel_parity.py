"""Parity pins for the hyperplane sign-bit numpy kernel (r14 opt).

similarity._corpus_lsh_buckets and dedup.embedding_lsh_pairs now
assign their LSH keys through similarity.plane_sign_bits — elementwise
products + a sequential np.cumsum dot — instead of per-plane
aggregate/zip_with literal expression trees. cumsum emits every
prefix, so its float association order is pinned to left-to-right,
the same order the JVM aggregate seeds with 0.0 (0.0 + p0 == p0
except at -0.0, where the >= 0 sign decision agrees). These tests pin
bucket/key equality against the verbatim expression forms on the full
corpus.
"""

from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.operators import dedup as D
from datafusion_async_parquet_index_spark.operators import similarity as S
from datafusion_async_parquet_index_spark.operators.util import (
    clear_caches,
    read_table,
)

SF = "/root/testdata/sf0.001"


def test_sim_bucket_kernel_matches_expression(spark):
    clear_caches()
    got = {r["vec_id"]: r["bucket"]
           for r in S._corpus_lsh_buckets(spark, SF)
           .select("vec_id", "bucket").collect()}
    vec = read_table(spark, SF, "embeddings")
    dim = S._embedding_dim(vec)
    want = {r["vec_id"]: r["bucket"] for r in vec.select(
        "vec_id",
        S._bucket_key(F.col("embedding"), dim).alias("bucket")).collect()}
    assert got == want
    assert len(got) > 0


def _expr_keys(emb, tables, planes):
    """The pre-kernel (vec_id, t, k) keying, verbatim."""
    dim = S._embedding_dim(emb)
    ed = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    keys = []
    for t in range(tables):
        bits = []
        for j in range(planes):
            w = F.array(*[F.lit(x) for x in
                          S._plane_weights(t * planes + j, dim)])
            dot = F.aggregate(F.zip_with(ed, w, lambda x, y: x * y),
                              F.lit(0.0), lambda acc, x: acc + x)
            bits.append(F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
        keys.append(F.struct(F.lit(t).alias("t"),
                             sum(bits).cast("int").alias("k")))
    return (emb.select("vec_id", F.explode(F.array(*keys)).alias("tk"))
            .select("vec_id", F.col("tk.t").alias("t"),
                    F.col("tk.k").alias("k")))


def test_dedup_lsh_keys_match_expression(spark):
    clear_caches()
    emb = read_table(spark, SF, "embeddings")
    want = sorted(tuple(r) for r in _expr_keys(
        emb, D.EMB_LSH_TABLES, D.EMB_LSH_PLANES).collect())

    # reach the kernel-built keyed frame through the operator: its
    # pair output is key-determined, so compare the full pair list too
    got_pairs = sorted(tuple(r) for r in
                       D.dedup_embedding_lsh(spark, SF).collect())
    assert len(got_pairs) > 0

    # and pin the keys themselves via a direct kernel run
    from datafusion_async_parquet_index_spark.operators.similarity import (
        plane_sign_bits,
    )
    import numpy as np

    dim = S._embedding_dim(emb)
    weights = [S._plane_weights(t * D.EMB_LSH_PLANES + j, dim)
               for t in range(D.EMB_LSH_TABLES)
               for j in range(D.EMB_LSH_PLANES)]
    rows = emb.select("vec_id", "embedding").collect()
    emat = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                     for r in rows])
    bits = plane_sign_bits(weights)(emat).reshape(
        len(rows), D.EMB_LSH_TABLES, D.EMB_LSH_PLANES)
    shifts = (1 << np.arange(D.EMB_LSH_PLANES, dtype=np.int64))
    got = sorted(
        (int(r["vec_id"]), t, int((bits[i, t] * shifts).sum()))
        for i, r in enumerate(rows) for t in range(D.EMB_LSH_TABLES))
    assert got == want
