"""Exact row-group scans: a Spark 4 Python DataSource.

Gives the engine the reference's ``ParquetAccessPlan`` semantics
(``/root/reference/sqlx-sqlite/src/index.rs:163-175``: per file, a
Scan/Skip decision per row group) which Spark's native reader does not
expose: partitions are (file, row-group chunk) and ``read`` uses pyarrow
``ParquetFile.read_row_groups`` to return Arrow batches, so skipped row
groups cost zero I/O beyond the footer.

The reference scans each file as its own partition for parallelism
("default to scanning them all in parallel", main.rs:287-288); here each
partition is a bounded chunk of row groups so a single huge file still
fans out across executors.
"""

from __future__ import annotations

import json
from typing import Dict, Iterator, List

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_CHUNK = 8  # row groups per task; bounds task size for huge files

_REGISTERED = set()


class RowGroupInputPartition(InputPartition):
    def __init__(self, path: str, row_groups: List[int]):
        self.path = path
        self.row_groups = row_groups


class RowGroupParquetReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.plan: Dict[str, List[int]] = json.loads(options["access_plan"])
        self.columns = [f.name for f in schema.fields]

    def partitions(self):
        parts = []
        for path, rgs in sorted(self.plan.items()):
            for i in range(0, len(rgs), _CHUNK):
                parts.append(RowGroupInputPartition(path, rgs[i:i + _CHUNK]))
        return parts or [RowGroupInputPartition("", [])]

    def read(self, partition: RowGroupInputPartition) -> Iterator:
        if not partition.path:
            return
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        table = pf.read_row_groups(partition.row_groups, columns=self.columns)
        for batch in table.to_batches():
            yield batch


class RowGroupParquetDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rowgroup_parquet"

    def schema(self):
        # caller always supplies .schema(...) explicitly; infer as fallback
        import pyarrow.parquet as pq
        plan = json.loads(self.options["access_plan"])
        first = sorted(plan)[0]
        import pyarrow as pa
        from pyspark.sql.pandas.types import from_arrow_schema
        return from_arrow_schema(pq.ParquetFile(first).schema_arrow)

    def reader(self, schema) -> DataSourceReader:
        return RowGroupParquetReader(schema, self.options)


def ensure_registered(spark) -> None:
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(RowGroupParquetDataSource)
        _REGISTERED.add(key)
