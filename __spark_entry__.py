"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the external-index pruned scan + aggregation
(reference demo Q3 shape) on /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 (+ the training-data pipeline operators), checked
against DuckDB at sf=0.01 by the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datafusion_async_parquet_index_spark.queries import q3_or_range_agg

    return q3_or_range_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datafusion_async_parquet_index_spark.queries import RELATIONAL_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(RELATIONAL_QUERIES)
    try:
        from datafusion_async_parquet_index_spark.operators import (
            PIPELINE_QUERIES,
        )
        out.update(PIPELINE_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from datafusion_async_parquet_index_spark.queries import RELATIONAL_ORACLE

    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLE)
    try:
        from datafusion_async_parquet_index_spark.operators import (
            PIPELINE_ORACLE,
        )
        out.update(PIPELINE_ORACLE)
    except ImportError:
        pass
    return out
