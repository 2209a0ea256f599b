from .catalog import FileStats, RowGroupStats, SqliteIndexCatalog
from .stats import build_index, extract_file_stats, index_schema_for, list_parquet_files
from .table import IndexedParquetTable, ScanDecision

__all__ = [
    "FileStats", "RowGroupStats", "SqliteIndexCatalog",
    "build_index", "extract_file_stats", "index_schema_for",
    "list_parquet_files", "IndexedParquetTable", "ScanDecision",
]
