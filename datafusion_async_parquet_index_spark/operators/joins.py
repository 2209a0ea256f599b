"""Join-strategy helpers for 100 TB posture: bucketed co-located joins
(no shuffle at read time) and deterministic salting for skewed keys.

Neither exists in the reference (its only join is the tiny catalog-side
file_statistics x row_group_statistics equi-join, reference
index.rs:139-152); these are the strategies a Spark deployment of the
same engine needs once fact-fact joins appear — SURVEY §0's "inherited
layer" made concrete.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
) -> None:
    """Persist a DataFrame as a bucketed (and optionally sorted) table.
    Two tables bucketed the same way join WITHOUT a shuffle — the classic
    pre-partitioning trade: pay one shuffle at write time, amortize it
    over every subsequent join. At 100 TB this is how the nightly
    fact-fact joins stop dominating the job."""
    writer = (df.write.mode("overwrite")
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)  # external table location
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str,
    on: Sequence[str], how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark
    plans a shuffle-free (and with sortBy, sort-free) merge."""
    return spark.table(left_table).join(spark.table(right_table),
                                        on=list(on), how=how)


def salted_join(
    left: DataFrame, right: DataFrame, on: str,
    n_salts: int = 8, how: str = "inner",
) -> DataFrame:
    """Equi-join with deterministic key salting for skewed left keys:
    the left side gets salt = hash(its key, row content) % n, the right
    side is replicated n times — a hot key's rows spread over n
    partitions instead of one straggler task. Result set is IDENTICAL to
    the plain join (every left row meets exactly one replica of each
    matching right row). AQE's skew-join handles moderate skew
    automatically; salting is for the pathological keys AQE can't split
    (a single key bigger than a partition).

    Only left-preserving join types are supported: the right side is
    replicated n_salts times, so for right/full outer joins every
    UNMATCHED right row would surface once per replica — a silently
    wrong result.  For those, salt the other side or fall back to AQE."""
    allowed = {"inner", "left", "left_outer", "leftouter", "cross",
               "semi", "left_semi", "leftsemi", "anti", "left_anti",
               "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating the "
            f"right side duplicates unmatched right rows under "
            f"right/full outer semantics (allowed: {sorted(allowed)})")
    salt_l = F.pmod(F.hash(F.col(on), F.monotonically_increasing_id()),
                    F.lit(n_salts))
    lft = left.withColumn("_salt", salt_l)
    rgt = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = lft.join(rgt, [on, "_salt"], how)
    return out.drop("_salt")
