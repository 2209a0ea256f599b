"""PySpark-native analytics engine with the capabilities of
datafusion-contrib/datafusion-async-parquet-index.

Core: an external statistics index over directories of Parquet files,
stored in a relational catalog, consulted at plan time to skip files and
row groups (the reference's whole point), plus the inherited relational
layer (SQL, joins, aggregation) wired through Catalyst — and the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) a 100 TB pipeline needs.
"""

from .plans.expr import Case, Col, Expr, Lit, and_all, col, lit
from .plans.pruning import PruningRewriter
from .sources.catalog import FileStats, RowGroupStats, SqliteIndexCatalog
from .sources.stats import build_index, extract_file_stats, index_schema_for
from .sources.table import (IndexedParquetTable, ScanDecision,
                            with_commit_retries)
from .session import get_spark

__all__ = [
    "Case", "Col", "Expr", "Lit", "and_all", "col", "lit",
    "PruningRewriter",
    "FileStats", "RowGroupStats", "SqliteIndexCatalog",
    "build_index", "extract_file_stats", "index_schema_for",
    "IndexedParquetTable", "ScanDecision", "with_commit_retries",
    "get_spark",
]
