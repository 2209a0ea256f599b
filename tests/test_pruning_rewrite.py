"""Unit tests for the refutation-sound stats-space rewrite (SURVEY §4).

Evaluation strategy: render the stats-space expr to SQLite SQL and run it
against a tiny in-memory stats table, checking which row groups survive.
"""

import sqlite3

import pytest

from datafusion_async_parquet_index_spark.plans.expr import Case, Lit, col, lit, and_all
from datafusion_async_parquet_index_spark.plans.pruning import PruningRewriter
from datafusion_async_parquet_index_spark.sources.catalog import _SqliteStatsSql

SCHEMA = {"value": "int", "text": "string"}

# (rg id, row_count, value_null_count, value_min, value_max,
#  text_null_count, text_min, text_max)
ROWS = [
    (0, 50, 0, 0, 49, 0, "", "y"),          # values 0..49
    (1, 50, 0, 50, 99, 0, "ax", "z"),       # values 50..99
    (2, 50, 0, 100, 149, 0, "cv", "eo"),    # values 100..149
    (3, 50, 5, None, None, 0, "a", "b"),    # value stats missing, some non-null
    (4, 50, 50, None, None, 0, "a", "b"),   # value all-null
]


def survivors(pred):
    rw = PruningRewriter(SCHEMA)
    stats = rw.rewrite(pred)
    cats = {"row_count": "int"}
    for n, c in SCHEMA.items():
        cats.update({f"{n}_min": c, f"{n}_max": c, f"{n}_null_count": "int"})
    r = _SqliteStatsSql(cats)
    sql = r.render(stats)
    conn = sqlite3.connect(":memory:")
    conn.execute(
        """CREATE TABLE s (rg INTEGER, row_count INTEGER,
           value_null_count INTEGER, value_min INTEGER, value_max INTEGER,
           text_null_count INTEGER, text_min TEXT, text_max TEXT)""")
    conn.executemany("INSERT INTO s VALUES (?,?,?,?,?,?,?,?)", ROWS)
    return [row[0] for row in conn.execute(f"SELECT rg FROM s WHERE {sql}", r.params)]


def test_point_equality():
    # rg1 contains 75; rg3 kept (stats missing); rg4 pruned (all null)
    assert survivors(col("value") == 75) == [1, 3]


def test_equality_out_of_range():
    assert survivors(col("value") == 5000) == [3]


def test_less_than():
    assert survivors(col("value") < 20) == [0, 3]


def test_greater_than():
    assert survivors(col("value") > 120) == [2, 3]


def test_ge_boundary():
    assert survivors(col("value") >= 149) == [2, 3]


def test_or_of_ranges():
    assert survivors((col("value") < 20) | (col("value") > 500)) == [0, 3]


def test_and_across_columns():
    assert survivors((col("value") < 20) & (col("text") == "a")) == [0, 3]


def test_contradictory_and():
    assert survivors((col("value") > 500) & (col("text") == "a")) == [3]


def test_not_equal():
    # a rg can only be refuted when min=max=v; rg4 (all null) is also
    # refutable since NULL != 75 is never TRUE
    assert survivors(col("value") != 75) == [0, 1, 2, 3]


def test_not_pushdown():
    # NOT(value < 50) == value >= 50
    assert survivors(~(col("value") < 50)) == [1, 2, 3]


def test_demorgan():
    assert survivors(~((col("value") < 50) | (col("value") > 99))) == [1, 3]


def test_is_null():
    assert survivors(col("value").is_null()) == [3, 4]


def test_is_not_null():
    assert survivors(col("value").is_not_null()) == [0, 1, 2, 3]


def test_like_prefix():
    # text LIKE 'c%' -> only rgs whose [min,max] range can contain 'c*';
    # rg3/rg4 have text_max='b' < 'c' and are refuted
    assert survivors(col("text").like("c%")) == [0, 1, 2]


def test_like_no_prefix_keeps_all():
    assert survivors(col("text").like("%c")) == [0, 1, 2, 3, 4]


def test_in_list():
    assert survivors(col("value").isin(75, 120)) == [1, 2, 3]


def test_unindexed_column_keeps_all():
    assert survivors(col("file_name") == "x") == [0, 1, 2, 3, 4]


def test_arithmetic_depth1_folds():
    # depth-1 int arithmetic folds onto the column: same survivors as
    # the plain  value == 75  predicate
    assert survivors((col("value") + 1) == 76) == [1, 3]
    assert survivors((col("value") * 2) == 150) == [1, 3]


def test_arithmetic_unfoldable_keeps_all():
    # col-col arithmetic still degrades to conservative TRUE
    assert survivors((col("value") + col("value")) == 150) == [0, 1, 2, 3, 4]


def test_division_folds():
    # round 5: TRUE division folds onto the column — value / 2 = 37.5
    # has no integer preimage for = 37? no: c / 2 = 37 <-> c = 74,
    # same survivors as the plain equality at 74
    assert survivors((col("value") / 2) == 37) == survivors(
        col("value") == 74)
    # and the modulo identity window: value % 10000 < 20 behaves like
    # value < 20 for groups proven inside |value| < 10000
    assert survivors((col("value") % 10000) < 20) == survivors(
        col("value") < 20)


def test_case_literal_arm_prunes_via_condition():
    # CASE WHEN value < 50 THEN 1 ELSE 0 END = 1 can only hold through
    # the WHEN arm -> prunes like value < 50 (rg3 kept: stats missing)
    pred = Case([(col("value") < 50, lit(1))], lit(0)) == 1
    assert survivors(pred) == [0, 3]
    # without an ELSE the fall-through yields NULL, which never
    # satisfies a comparison — same pruning
    pred = Case([(col("value") < 50, lit(1))], None) == 1
    assert survivors(pred) == [0, 3]


def test_case_else_arm_reachable_keeps_all():
    # = 0 is satisfiable through the ELSE arm, whose reachability the
    # rewrite over-approximates as TRUE
    pred = Case([(col("value") < 50, lit(1))], lit(0)) == 0
    assert survivors(pred) == [0, 1, 2, 3, 4]


def test_case_unsatisfiable_prunes_all():
    pred = Case([(col("value") < 50, lit(1))], lit(0)) == 2
    assert survivors(pred) == []


def test_case_null_arm_never_matches():
    # NULL THEN-arm can never equal 0; only the ELSE arm matches -> TRUE
    pred = Case([(col("value") > 10, Lit(None))], lit(0)) == 0
    assert survivors(pred) == [0, 1, 2, 3, 4]


def test_case_non_literal_arm_keeps_all():
    pred = Case([(col("value") > 10, col("value"))], lit(0)) == 1
    assert survivors(pred) == [0, 1, 2, 3, 4]


def test_case_boolean_arms():
    pred = Case([(col("value") > 10, lit(True))], lit(False)) == True
    assert survivors(pred) == [0, 1, 2, 3]  # rg4 all-null: > refuted


def test_literal_false_prunes_all():
    assert survivors(lit(False)) == []


def test_and_all_empty_is_true():
    assert survivors(and_all([])) == [0, 1, 2, 3, 4]


def test_col_on_right_side():
    assert survivors(lit(75) == col("value")) == [1, 3]
    assert survivors(lit(20) > col("value")) == [0, 3]


def test_unsupported_types_never_indexed():
    """Nested/list types can't carry min/max stats — they must be
    silently dropped from the index schema (reference skips unsupported
    stats at index.rs:213-217), so predicates on them never prune."""
    import pyarrow as pa

    from datafusion_async_parquet_index_spark.sources.stats import (
        index_schema_for,
    )
    schema = pa.schema([
        ("a", pa.int32()),
        ("e", pa.list_(pa.float32())),
        ("m", pa.map_(pa.string(), pa.int64())),
        ("s", pa.string()),
        ("t", pa.timestamp("ms")),
    ])
    got = index_schema_for(schema, ["a", "e", "m", "s", "t", "missing"])
    assert got == {"a": "int", "s": "string", "t": "timestamp"}


# -- column-column comparisons (round 4) ------------------------------

SCHEMA2 = {"a": "int", "b": "int", "s": "string"}

# (rg id, row_count, a_nc, a_min, a_max, b_nc, b_min, b_max,
#  s_nc, s_min, s_max)
ROWS2 = [
    (0, 10, 0, 0, 10, 0, 20, 30, 0, "a", "b"),    # a entirely below b
    (1, 10, 0, 50, 60, 0, 0, 40, 0, "a", "b"),    # a entirely above b
    (2, 10, 0, 5, 5, 0, 5, 5, 0, "a", "b"),       # both constant 5
    (3, 10, 2, None, None, 0, 0, 1, 0, "a", "b"), # a stats missing
    (4, 10, 10, None, None, 0, 0, 1, 0, "a", "b"),# a all-null
]


def survivors2(pred):
    rw = PruningRewriter(SCHEMA2)
    stats = rw.rewrite(pred)
    cats = {"row_count": "int"}
    for n, c in SCHEMA2.items():
        cats.update({f"{n}_min": c, f"{n}_max": c, f"{n}_null_count": "int"})
    r = _SqliteStatsSql(cats)
    sql = r.render(stats)
    conn = sqlite3.connect(":memory:")
    conn.execute(
        """CREATE TABLE s (rg INTEGER, row_count INTEGER,
           a_null_count INTEGER, a_min INTEGER, a_max INTEGER,
           b_null_count INTEGER, b_min INTEGER, b_max INTEGER,
           s_null_count INTEGER, s_min TEXT, s_max TEXT)""")
    conn.executemany("INSERT INTO s VALUES (?,?,?,?,?,?,?,?,?,?,?)", ROWS2)
    return [row[0]
            for row in conn.execute(f"SELECT rg FROM s WHERE {sql}", r.params)]


def test_colcol_less_than():
    # rg0 satisfiable; rg1 refuted (a_min 50 >= b_max 40); rg2 refuted
    # (5 < 5 impossible); rg3 kept (guard); rg4 pruned (a all-null)
    assert survivors2(col("a") < col("b")) == [0, 3]


def test_colcol_greater_than():
    assert survivors2(col("a") > col("b")) == [1, 3]


def test_colcol_lte_gte_at_equality():
    assert survivors2(col("a") <= col("b")) == [0, 2, 3]
    assert survivors2(col("a") >= col("b")) == [1, 2, 3]


def test_colcol_equality_interval_intersection():
    # rg0/rg1 disjoint intervals -> refuted; rg2 overlaps at 5
    assert survivors2(col("a") == col("b")) == [2, 3]


def test_colcol_not_equal_single_valued():
    # only rg2 (both constant at the same value) is refutable; rg4
    # (a all-null) is kept conservatively: the NOT-form evaluates
    # NOT(NULL AND FALSE) = NOT FALSE = TRUE — sound, not minimal
    assert survivors2(col("a") != col("b")) == [0, 1, 3, 4]


def test_colcol_same_column():
    assert survivors2(col("a") < col("a")) == []
    assert survivors2(col("a") != col("a")) == []
    assert survivors2(col("a") <= col("a")) == [0, 1, 2, 3, 4]


def test_colcol_not_pushdown():
    # NOT(a < b) -> a >= b via comparison negation
    from datafusion_async_parquet_index_spark.plans.expr import Not
    assert survivors2(Not(col("a") < col("b"))) == [1, 2, 3]


def test_colcol_cross_category_bails():
    # int vs string ordering differs between engines -> no pruning
    assert survivors2(col("a") < col("s")) == [0, 1, 2, 3, 4]


def test_colcol_unindexed_side_bails():
    assert survivors2(col("a") < col("zzz")) == [0, 1, 2, 3, 4]


def test_large_inlist_degrades_to_bounds_soundly():
    """An IN-list past INLIST_PRUNE_CAP must degrade to the enclosing
    [min, max] window: still prunes groups fully outside the hull,
    never drops a group containing a listed value, and the rendered
    SQL stays O(1) in the list size (a per-value OR chain past a few
    hundred terms overflows SQLite's parser stack)."""
    from datafusion_async_parquet_index_spark.plans.expr import InList

    cap = PruningRewriter.INLIST_PRUNE_CAP
    values = [lit(v) for v in range(60, 60 + cap + 40)]  # 60..163
    pred = InList(col("value"), values)
    kept = survivors(pred)
    # rg0 (0..49) is fully outside the hull [60, 163] -> pruned;
    # rg1 (50..99) and rg2 (100..149) intersect -> kept;
    # rg3 (stats missing) must be kept conservatively.
    assert 0 not in kept
    assert {1, 2, 3} <= set(kept)
    # SQL size bounded: the capped rewrite emits one window, not
    # len(values) OR terms
    rw = PruningRewriter(SCHEMA)
    sql_capped = rw.rewrite(pred).to_sql()
    sql_small = rw.rewrite(
        InList(col("value"), [lit(60), lit(163)])).to_sql()
    assert len(sql_capped) < len(sql_small) * 4


def test_large_inlist_satisfaction_is_never_claimed():
    """The satisfaction dual under the cap answers Lit(False) — groups
    demote to boundary scans, never to a wrong catalog-only answer."""
    from datafusion_async_parquet_index_spark.plans.expr import InList, Lit as L

    cap = PruningRewriter.INLIST_PRUNE_CAP
    rw = PruningRewriter(SCHEMA)
    sat = rw.satisfies(InList(col("value"),
                              [lit(v) for v in range(cap + 10)]))
    assert isinstance(sat, L) and sat.value is False
