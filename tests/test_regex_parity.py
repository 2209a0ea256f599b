"""Property-based cross-engine regex parity for the PII patterns.

The PII scrub's correctness rests on Spark (Java regex) and DuckDB (RE2)
counting IDENTICAL matches for the same pattern on the same string.  The
patterns deliberately stay inside the dialect-common subset (character
classes, bounded repetition, literal dots) — this test fuzzes that
assumption with adversarial inputs (emails inside words, dotted digit
runs, dashes everywhere) instead of trusting the curated fixtures.
"""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from datafusion_async_parquet_index_spark.operators.curation import (
    EMAIL_RE, IPV4_RE, PHONE_RE,
)

# alphabet chosen to stress the patterns: digits, dots, dashes, @, the
# pattern-relevant letters, spaces and a few specials
_ALPHABET = "ab0189.@-_% +c!:/x"

_texts = st.lists(
    st.text(alphabet=_ALPHABET, min_size=0, max_size=60),
    min_size=1, max_size=8)


def _duck_counts(con, texts, pattern):
    rows = con.execute(
        "SELECT len(regexp_extract_all(t, ?)) FROM "
        "(SELECT unnest(?) AS t)", [pattern, texts]).fetchall()
    return [r[0] for r in rows]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=25, deadline=None)
@given(texts=_texts)
def test_pii_regex_counts_match_cross_engine(spark, duck, texts):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = (
        df.orderBy("i")
        .select(*[F.regexp_count(F.col("t"), F.lit(p)).alias(f"c{k}")
                  for k, p in enumerate((EMAIL_RE, IPV4_RE, PHONE_RE))])
        .collect())
    for k, pattern in enumerate((EMAIL_RE, IPV4_RE, PHONE_RE)):
        spark_counts = [r[f"c{k}"] for r in got]
        duck_counts = _duck_counts(duck, texts, pattern)
        assert spark_counts == duck_counts, (pattern, texts)


@settings(max_examples=15, deadline=None)
@given(texts=_texts)
def test_pii_redaction_length_matches_cross_engine(spark, duck, texts):
    """The scrub's chars_redacted depends on regexp_replace replacing
    the same spans in both engines — compare the post-redaction lengths
    directly."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE, "<PHONE>"),
        IPV4_RE, "<IP>")
    got = [r[0] for r in df.orderBy("i").select(F.length(red)).collect()]
    rows = duck.execute(
        "SELECT length(regexp_replace(regexp_replace(regexp_replace("
        "t, ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g'), ?, '<IP>', 'g')) "
        "FROM (SELECT unnest(?) AS t)",
        [EMAIL_RE, PHONE_RE, IPV4_RE, texts]).fetchall()
    assert got == [r[0] for r in rows], texts
