"""SQL WHERE-clause parser: AST equivalence with the Expr-builder API,
identical pruning decisions through the indexed table, and loud errors
on unsupported syntax.
"""

import pytest

from datafusion_async_parquet_index_spark.plans.expr import col, lit
from datafusion_async_parquet_index_spark.plans.sql_predicate import (
    SqlPredicateError, parse_predicate,
)

EQUIVALENT = [
    ("value = 150", col("value") == 150),
    ("value <> 150", col("value") != 150),
    ("value != 150", col("value") != 150),
    ("value < 20 OR value > 500", (col("value") < 20) | (col("value") > 500)),
    ("value < 20 AND text = 'a'", (col("value") < 20) & (col("text") == "a")),
    ("NOT value >= 100", ~(col("value") >= 100)),
    ("text LIKE 'a%'", col("text").like("a%")),
    ("text NOT LIKE 'a%'", col("text").not_like("a%")),
    ("value IN (5, 150, 2999)", col("value").isin(5, 150, 2999)),
    ("value NOT IN (5, 150)", ~col("value").isin(5, 150)),
    ("value IS NULL", col("value").is_null()),
    ("value IS NOT NULL", col("value").is_not_null()),
    ("value BETWEEN 10 AND 20",
     (col("value") >= 10) & (col("value") <= 20)),
    ("value + 1 = 151", col("value") + 1 == 151),
    ("value * 2 - 10 > 100", col("value") * 2 - 10 > 100),
    ("value % 2 = 0", col("value") % 2 == 0),
    ("-5 < value", lit(-5) < col("value")),
    ("(value < 20 OR value > 500) AND text = 'a'",
     ((col("value") < 20) | (col("value") > 500)) & (col("text") == "a")),
]


@pytest.mark.parametrize(
    "sql,expected", EQUIVALENT, ids=[s for s, _ in EQUIVALENT])
def test_parse_equivalent(sql, expected):
    assert repr(parse_predicate(sql)) == repr(expected)


def test_string_escape():
    e = parse_predicate("text = 'it''s'")
    assert repr(e) == repr(col("text") == "it's")


def test_date_and_timestamp_literals():
    import datetime as dt
    e = parse_predicate("d >= DATE '1995-01-01'")
    assert repr(e) == repr(col("d") >= dt.date(1995, 1, 1))
    e = parse_predicate("ts < TIMESTAMP '1996-01-01 00:00:00'")
    assert repr(e) == repr(col("ts") < dt.datetime(1996, 1, 1))


@pytest.mark.parametrize("bad", [
    "", "value =", "value = = 1", "value IN ()", "SELECT 1",
    "value LIKE 5", "value BETWEEN 1", "f(value) = 1 AND", "value @ 3",
])
def test_parse_errors_are_loud(bad):
    with pytest.raises(SqlPredicateError):
        parse_predicate(bad)


def test_sql_path_prunes_like_expr_path(spark, tmp_path):
    from datafusion_async_parquet_index_spark.sources.demo_corpus import (
        write_demo_corpus,
    )
    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )
    d = str(tmp_path / "corpus")
    write_demo_corpus(d)
    t = IndexedParquetTable(spark, d, ["value", "text"])
    rows = t.query_sql("value = 150").collect()
    assert [(r["file_name"], r["value"]) for r in rows] == [
        ("file2.parquet", 150)]
    sql_decision = dict(t.last_scan.files_scanned)
    t.query(col("value") == 150)
    assert t.last_scan.files_scanned == sql_decision

    # contradictory AND through SQL: zero I/O
    assert t.query_sql("value > 500 AND text = 'a'").count() == 0
    assert t.last_scan.files_scanned == {}


def test_case_when_parses_and_scans_conservatively(spark, tmp_path):
    from datafusion_async_parquet_index_spark.plans.expr import Case
    from datafusion_async_parquet_index_spark.sources.demo_corpus import (
        write_demo_corpus,
    )
    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )
    e = parse_predicate(
        "CASE WHEN value < 100 THEN text = 'a' ELSE value = 150 END")
    assert isinstance(e, Case) and len(e.branches) == 1

    d = str(tmp_path / "corpus")
    write_demo_corpus(d)
    t = IndexedParquetTable(spark, d, ["value", "text"])
    got = sorted(r["value"] for r in t.query_sql(
        "CASE WHEN value < 100 THEN text = 'a' ELSE value = 150 END"
    ).collect())
    # CASE can't prune (conservative TRUE: all files scanned), but the
    # residual filter gives the exact answer
    assert t.last_scan.row_groups_scanned == 60
    assert got == [1, 150]  # text='a' only at value 1; else-branch at 150


# -- property: parse(to_sql(e)) reproduces e over the printable surface ----

from hypothesis import given, settings, strategies as st

from datafusion_async_parquet_index_spark.plans.expr import (
    BinOp, Case, InList, IsNull, Like, Lit, Not,
)

_cols = st.sampled_from(["value", "text", "price"]).map(col)
_lits = st.one_of(
    st.integers(-1000, 1000).map(lit),
    st.floats(-1e6, 1e6, allow_nan=False).map(lambda f: lit(round(f, 3))),
    st.text(alphabet="abc %_'", max_size=6).map(lit),
    st.booleans().map(lit),
)
_leaf = st.one_of(_cols, _lits)


def _exprs(depth):
    if depth == 0:
        return _leaf
    sub = _exprs(depth - 1)
    return st.one_of(
        _leaf,
        st.tuples(st.sampled_from(["=", "!=", "<", "<=", ">", ">=",
                                   "+", "-", "*", "/", "%", "AND", "OR"]),
                  sub, sub).map(lambda t: BinOp(*t)),
        sub.map(Not),
        st.tuples(sub, st.booleans()).map(lambda t: IsNull(t[0], t[1])),
        st.tuples(_cols, st.text(alphabet="ab%_", max_size=5),
                  st.booleans()).map(lambda t: Like(*t)),
        st.tuples(_cols, st.lists(st.integers(0, 99).map(lit),
                                  min_size=1, max_size=3)).map(
            lambda t: InList(*t)),
        st.tuples(sub, sub, sub).map(
            lambda t: Case([(t[0], t[1])], t[2])),
    )


@settings(max_examples=300, deadline=None)
@given(_exprs(3))
def test_parser_roundtrips_printed_expressions(e):
    """to_sql() output must parse back to an identical AST (identical
    re-rendering) — parser and printer cannot drift."""
    rendered = e.to_sql()
    assert parse_predicate(rendered).to_sql() == rendered


def test_contains_token_function():
    from datafusion_async_parquet_index_spark.plans.expr import ContainsToken
    from datafusion_async_parquet_index_spark.plans.sql_predicate import (
        parse_predicate,
    )

    e = parse_predicate("contains_token(body, 'needle') AND doc_id < 10")
    # left conjunct is the token predicate
    left = e.left
    assert isinstance(left, ContainsToken)
    assert left.token == "needle"
    assert left.columns() == {"body"}
    assert "contains_token" in e.to_sql()


def test_contains_token_rejects_non_string():
    import pytest as _pytest

    from datafusion_async_parquet_index_spark.plans.sql_predicate import (
        SqlPredicateError, parse_predicate,
    )
    with _pytest.raises(SqlPredicateError):
        parse_predicate("contains_token(body, 42)")


def test_full_statement_sql_routes_through_index(spark, demo_dir):
    """t.sql(): whole SELECT statements execute through Catalyst while
    the top-level WHERE drives the pruned scan; no-WHERE statements run
    the catalog-consistent full scan; a non-'self' FROM is rejected."""
    import pytest as _pytest

    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )

    t = IndexedParquetTable(spark, demo_dir, ["value", "text"])
    df = t.sql("SELECT file_name, COUNT(*) AS n FROM self "
               "WHERE value = 150 GROUP BY file_name")
    assert t.last_scan.row_groups_scanned == 1  # the golden Q2 prune
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["n"] >= 1
    # parens inside WHERE must not confuse the depth-0 ender scan
    df2 = t.sql("SELECT value FROM self WHERE value IN (150, 250) "
                "ORDER BY value LIMIT 3")
    got = [r["value"] for r in df2.collect()]
    assert got == sorted(got) and set(got) <= {150, 250}
    assert t.last_scan.row_groups_scanned < t.last_scan.total_row_groups
    # no WHERE: full catalog-consistent scan
    n_all = t.sql("SELECT COUNT(*) AS n FROM self").head()["n"]
    assert n_all == t.count_rows()
    with _pytest.raises(ValueError, match="FROM target"):
        t.sql("SELECT * FROM other_table WHERE value = 1")


def test_full_statement_sql_edge_cases(spark, demo_dir):
    """Scanner robustness: identifiers CONTAINING keyword substrings
    (rate_limit) don't truncate the WHERE; string literals containing
    keywords or parens are skipped; several 'self' references fall
    back to the correct-by-construction full-scan path (subquery rows
    must NOT be filtered by the outer WHERE); out-of-grammar WHEREs
    degrade to a full scan, never an error."""
    from pyspark.sql import functions as F

    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )

    t = IndexedParquetTable(spark, demo_dir, ["value", "text"])
    # keyword-substring identifier: alias the scan then filter on it
    n = t.sql("SELECT COUNT(*) AS n FROM self "
              "WHERE value > 100 AND value < 200").head()["n"]
    assert n == t.query(None).filter(
        (F.col("value") > 100) & (F.col("value") < 200)).count()
    # string literal containing an ender keyword and parens
    r = t.sql("SELECT COUNT(*) AS n FROM self "
              "WHERE text = 'order by (name)' OR value = 150").head()
    assert r["n"] == t.query(None).filter(
        (F.col("text") == "order by (name)")
        | (F.col("value") == 150)).count()
    # multiple self references: subquery semantics preserved (the
    # inner MAX is over the WHOLE table, not the outer WHERE's rows)
    r2 = t.sql("SELECT COUNT(*) AS n FROM self "
               "WHERE value < 10 AND value < (SELECT MAX(value) "
               "FROM self)").head()
    assert r2["n"] == t.query(None).filter(F.col("value") < 10).count()
    # out-of-grammar WHERE (function call): full scan, the statement's
    # own WHERE still applies through Catalyst (NULL text excluded)
    r3 = t.sql("SELECT COUNT(*) AS n FROM self "
               "WHERE length(text) >= 1").head()
    assert r3["n"] == t.query(None).filter(
        F.length("text") >= 1).count()


def test_full_statement_sql_sanitizes_view_name(spark, tmp_path):
    """Tables over directories that aren't SQL identifiers (dashes,
    dots) still work through t.sql()."""
    import os as _os

    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )

    d = str(tmp_path / "my-table.v2")
    df = spark.range(10).selectExpr("id AS v")
    tmp = str(tmp_path / "_t")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(p for p in sorted(_os.listdir(tmp))
                if p.endswith(".parquet"))
    _os.makedirs(d, exist_ok=True)
    _os.replace(_os.path.join(tmp, part), _os.path.join(d, "f.parquet"))
    t = IndexedParquetTable(spark, d, ["v"])
    assert t.sql("SELECT COUNT(*) AS n FROM self WHERE v >= 5"
                 ).head()["n"] == 5
