"""Training-data pipeline operators: dedup, similarity search, text
analysis, event analytics, multimodal columns."""

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

from .curation import CURATION_ORACLE, CURATION_QUERIES
from .dedup import DEDUP_ORACLE, DEDUP_QUERIES
from .events import EVENTS_ORACLE, EVENTS_QUERIES
from .multimodal import MULTIMODAL_ORACLE, MULTIMODAL_QUERIES
from .similarity import SIMILARITY_ORACLE, SIMILARITY_QUERIES
from .text import TEXT_ORACLE, TEXT_QUERIES
from .web import WEB_ORACLE, WEB_QUERIES

PIPELINE_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
PIPELINE_ORACLE: Dict[str, str] = {}
for _q, _o in [
    (TEXT_QUERIES, TEXT_ORACLE),
    (DEDUP_QUERIES, DEDUP_ORACLE),
    (SIMILARITY_QUERIES, SIMILARITY_ORACLE),
    (EVENTS_QUERIES, EVENTS_ORACLE),
    (MULTIMODAL_QUERIES, MULTIMODAL_ORACLE),
    (CURATION_QUERIES, CURATION_ORACLE),
    (WEB_QUERIES, WEB_ORACLE),
]:
    PIPELINE_QUERIES.update(_q)
    PIPELINE_ORACLE.update(_o)

__all__ = ["PIPELINE_QUERIES", "PIPELINE_ORACLE"]
