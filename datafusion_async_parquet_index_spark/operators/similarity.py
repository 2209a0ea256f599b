"""Approximate-nearest-neighbor similarity search over the
``embeddings`` table (``embedding: array<float>``).

Two paths, per the standard scale ladder:

- ``sim_bruteforce_topk``: exact cosine top-k, query side broadcast
  against a full scan of the corpus. O(Q x N x d) — the correctness
  baseline, and perfectly scalable when Q is small (the broadcast makes
  it a map-only pass over the corpus, no shuffle of the big side).
- ``sim_lsh_topk``: random-hyperplane LSH — deterministic pseudo-random
  planes derived from the shared hash60 primitive, sign-bit bucket key,
  candidates restricted to same-bucket vectors, exact cosine re-rank
  inside the bucket. The scale path: at 100 TB the bucket join replaces
  the full corpus scan per query. Recall < 1 by design (approximate) —
  oracle-checked against the same formula in SQL, not against the exact
  top-k.

Both computations are fully deterministic and reproduced exactly by the
DuckDB oracle (same plane hashes, same tie-breaks: sort by rounded
cosine desc, then vec_id asc).
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import cosine_similarity, hash60
from .util import read_table

TOPK = 5
N_QUERIES_MOD = 100   # vec_id % 100 == 0 => query set (5 at sf0.01)
N_PLANES = 8          # LSH hyperplanes => 256 buckets


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k per query vector. Tie-break on vec_id after
    rounding to 6 decimals keeps rank deterministic across engines."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % N_QUERIES_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"))
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
    cos = F.round(cosine_similarity(F.col("qe"), F.col("ce")), 6)
    scored = pairs.select("query_id", "cand_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "cand_id", "cosine",
                F.col("rank").cast("int").alias("rank"))
    )


SIM_BRUTEFORCE_SQL = f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        FROM embeddings WHERE vec_id % {N_QUERIES_MOD} = 0
    ), c AS (
        SELECT vec_id AS cand_id, embedding::DOUBLE[] AS ce FROM embeddings
    ), scored AS (
        SELECT query_id, cand_id,
               ROUND(list_dot_product(qe, ce)
                     / (sqrt(list_dot_product(qe, qe))
                        * sqrt(list_dot_product(ce, ce))), 6) AS cosine
        FROM c JOIN q ON query_id != cand_id
    )
    SELECT query_id, cand_id, cosine, rank FROM (
        SELECT query_id, cand_id, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC, cand_id ASC) AS INT) AS rank
        FROM scored) t
    WHERE rank <= {TOPK}
"""


# -- LSH-bucketed variant ---------------------------------------------------
# plane p, dim d weight: (hash60('p|d') % 2001 - 1000) / 1000  in [-1, 1]

def _plane_weight(p: int, d_col):
    h = hash60(F.concat(F.lit(f"{p}|"), d_col.cast("string")))
    return (h % 2001 - 1000) / F.lit(1000.0)


def _bucket_key(e_col):
    """Sign-bit bucket key over N_PLANES deterministic hyperplanes.
    dot_p = sum_d e[d] * w(p, d); bit p = dot_p >= 0."""
    bits = []
    for p in range(N_PLANES):
        dot = F.aggregate(
            F.zip_with(
                F.transform(e_col, lambda x: x.cast("double")),
                F.sequence(F.lit(0), F.size(e_col) - 1),
                lambda x, i: x * _plane_weight(p, i),
            ),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sum(bits).cast("int")


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: candidates share the query's LSH bucket; exact cosine
    re-rank within the bucket. The bucket equi-join is the only shuffle
    and it moves (bucket, vec) pairs — at scale, bucket the corpus once
    (write bucketed) and this becomes a co-located join."""
    emb = read_table(spark, sf_dir, "embeddings")
    bucketed = emb.select(
        "vec_id", "embedding", _bucket_key(F.col("embedding")).alias("bucket"))
    q = bucketed.filter(F.col("vec_id") % N_QUERIES_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"),
        F.col("bucket").alias("qb"))
    c = bucketed.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"),
        F.col("bucket").alias("cb"))
    pairs = c.join(F.broadcast(q), (F.col("qb") == F.col("cb"))
                   & (F.col("query_id") != F.col("cand_id")))
    cos = F.round(cosine_similarity(F.col("qe"), F.col("ce")), 6)
    scored = pairs.select("query_id", "cand_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "cand_id", "cosine",
                F.col("rank").cast("int").alias("rank"))
    )


def _lsh_sql() -> str:
    from ..functions import sql_hash60
    # dot_p = list_sum([e[i] * w(p, i-1) for i in 1..len]) (1-indexed lists)
    terms = []
    for p in range(N_PLANES):
        h = sql_hash60(f"'{p}|' || (i - 1)::VARCHAR")
        w_expr = f"(({h} % 2001 - 1000) / 1000.0)"
        dot = (f"list_sum([e[i] * {w_expr} "
               f"for i in range(1, len(e) + 1)])")
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(terms)
    return f"""
        WITH b AS (
            SELECT vec_id, embedding::DOUBLE[] AS e,
                   CAST(({bucket}) AS INT) AS bucket
            FROM embeddings
        ), q AS (
            SELECT vec_id AS query_id, e AS qe, bucket AS qb
            FROM b WHERE vec_id % {N_QUERIES_MOD} = 0
        ), c AS (
            SELECT vec_id AS cand_id, e AS ce, bucket AS cb FROM b
        ), scored AS (
            SELECT query_id, cand_id,
                   ROUND(list_dot_product(qe, ce)
                         / (sqrt(list_dot_product(qe, qe))
                            * sqrt(list_dot_product(ce, ce))), 6) AS cosine
            FROM c JOIN q ON qb = cb AND query_id != cand_id
        )
        SELECT query_id, cand_id, cosine, rank FROM (
            SELECT query_id, cand_id, cosine,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, cand_id ASC) AS INT) AS rank
            FROM scored) t
        WHERE rank <= {TOPK}
    """


SIMILARITY_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "sim_lsh_topk": sim_lsh_topk,
}

SIMILARITY_ORACLE: Dict[str, str] = {
    "sim_bruteforce_topk": SIM_BRUTEFORCE_SQL,
    "sim_lsh_topk": _lsh_sql(),
}
