"""Shared helpers for the pipeline operators.

``read_table`` is the single entry point every operator and query uses to
load a testdata parquet table, and it must work in a *vanilla*
SparkSession (the driver's correctness harness builds its own session
without our ``session.py`` factory).  The one wrinkle is
``events.parquet``: the driver writes its ``ts`` column as
``TIMESTAMP(NANOS)``, which Spark's vectorized parquet reader rejects
with ``PARQUET_TYPE_ILLEGAL`` unless
``spark.sql.legacy.parquet.nanosAsLong=true``.  That conf is a runtime
SQL conf (verified settable via ``spark.conf.set`` on PySpark 4.x), so
the fix is: attempt the plain read, and on PARQUET_TYPE_ILLEGAL set the
conf and retry (the ``ts`` column then surfaces as a nanos BIGINT, which
is exactly what the events operators assume).  A last-resort pyarrow
conversion covers hypothetical deployments where the conf is rejected —
that path is driver-side and only acceptable for small local harnesses,
never the 100 TB path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        return spark.read.parquet(path)
    except Exception as exc:  # AnalysisException on nanos timestamps
        if "PARQUET_TYPE_ILLEGAL" not in str(exc):
            raise
    try:
        spark.conf.set(_NANOS_CONF, "true")
        return spark.read.parquet(path)
    except Exception:
        return _read_nanos_via_arrow(spark, path)


def _read_nanos_via_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Fallback for sessions where the nanosAsLong conf cannot be set:
    read with pyarrow, cast ns-timestamps to int64 (same nanos-BIGINT
    surface as the conf path), and parallelize.  Driver-side — local
    harness escape hatch only."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    cols, fields = [], []
    for field, column in zip(tbl.schema, tbl.columns):
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
            column = column.cast(pa.int64())
            field = pa.field(field.name, pa.int64())
        cols.append(column)
        fields.append(field)
    fixed = pa.table(cols, schema=pa.schema(fields))
    return spark.createDataFrame(fixed.to_pandas())
