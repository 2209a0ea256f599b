"""Property-based soundness of the pruning rewrite (SURVEY §5c):

    for random data and random predicates,
    every row group containing a row that satisfies the predicate
    MUST survive pruning (over-selection allowed, under-selection never).

The predicate is evaluated row-by-row with SQL ternary-logic semantics in
pure Python; the rewrite is evaluated through the real SQLite catalog
path (same renderer the engine uses).  Covers all six catalog type
categories: int, float (via int col + float literals), string, binary,
timestamp, date — the timestamp/date integer encodings and the BLOB
ordering are exactly where a silent wrong-prune could hide.
"""

import datetime as _dt
import sqlite3

from hypothesis import given, settings, strategies as st

from datafusion_async_parquet_index_spark.plans.expr import (
    BinOp, Col, Expr, InList, IsNull, Like, Lit, Not,
)
from datafusion_async_parquet_index_spark.plans.pruning import PruningRewriter
from datafusion_async_parquet_index_spark.sources.catalog import _SqliteStatsSql

SCHEMA = {"v": "int", "t": "string", "d": "date", "ts": "timestamp",
          "b": "binary"}
RG_SIZE = 4


# -- row-level evaluator with SQL NULL semantics ---------------------------

def _cmp(op, a, b):
    if a is None or b is None:
        return None
    if op == "=":
        return a == b
    if op == "!=":
        return a != b
    if op == "<":
        return a < b
    if op == "<=":
        return a <= b
    if op == ">":
        return a > b
    if op == ">=":
        return a >= b
    raise AssertionError(op)


def _like(value, pattern):
    if value is None:
        return None
    import re
    rx = re.escape(pattern)
    rx = rx.replace(re.escape("%"), ".*").replace(re.escape("_"), ".")
    return re.fullmatch(rx, value, flags=re.DOTALL) is not None


def eval_row(e: Expr, row: dict):
    if isinstance(e, Lit):
        return e.value
    if isinstance(e, Col):
        return row[e.name]
    if isinstance(e, Not):
        v = eval_row(e.child, row)
        return None if v is None else (not v)
    if isinstance(e, IsNull):
        v = eval_row(e.child, row)
        return (v is not None) if e.negated else (v is None)
    if isinstance(e, Like):
        v = _like(eval_row(e.child, row), e.pattern)
        if v is None:
            return None
        return (not v) if e.negated else v
    if isinstance(e, InList):
        v = eval_row(e.child, row)
        if v is None:
            return None
        return any(v == x.value for x in e.values)
    if isinstance(e, BinOp):
        l, r = eval_row(e.left, row), eval_row(e.right, row)
        if e.op == "AND":
            if l is False or r is False:
                return False
            if l is None or r is None:
                return None
            return l and r
        if e.op == "OR":
            if l is True or r is True:
                return True
            if l is None or r is None:
                return None
            return l or r
        return _cmp(e.op, l, r)
    raise AssertionError(type(e))


# -- strategies ------------------------------------------------------------

ints = st.integers(-20, 20)
strs = st.text(alphabet="abc", min_size=0, max_size=3)
dates = st.integers(0, 30).map(
    lambda n: _dt.date(2024, 1, 1) + _dt.timedelta(days=n))
# microsecond-resolution stamps, including sub-second offsets, so the
# epoch-micros catalog encoding is exercised below whole seconds
stamps = st.integers(0, 90_000_000).map(
    lambda us: _dt.datetime(2024, 6, 1) + _dt.timedelta(microseconds=us * 7))
blobs = st.binary(max_size=3).map(bytes)
CMP_OPS = ["=", "!=", "<", "<=", ">", ">="]


def leaf():
    num_cmp = st.builds(
        lambda op, v: BinOp(op, Col("v"), Lit(v)),
        st.sampled_from(CMP_OPS), ints)
    # float literal against the int column: same category family, and the
    # SQLite INTEGER/REAL numeric comparison must agree with Python's
    float_cmp = st.builds(
        lambda op, v: BinOp(op, Col("v"), Lit(v)),
        st.sampled_from(CMP_OPS),
        st.integers(-40, 40).map(lambda n: n / 2.0))
    str_cmp = st.builds(
        lambda op, v: BinOp(op, Col("t"), Lit(v)),
        st.sampled_from(CMP_OPS), strs)
    like = st.builds(
        lambda p, neg: Like(Col("t"), p, negated=neg),
        st.text(alphabet="ab%_", min_size=1, max_size=4), st.booleans())
    null = st.builds(
        lambda c, neg: IsNull(Col(c), negated=neg),
        st.sampled_from(sorted(SCHEMA)), st.booleans())
    inlist = st.builds(
        lambda vs: InList(Col("v"), [Lit(v) for v in vs]),
        st.lists(ints, min_size=1, max_size=3))
    date_cmp = st.builds(
        lambda op, v: BinOp(op, Col("d"), Lit(v)),
        st.sampled_from(CMP_OPS), dates)
    ts_cmp = st.builds(
        lambda op, v: BinOp(op, Col("ts"), Lit(v)),
        st.sampled_from(CMP_OPS), stamps)
    # date literal on the timestamp column: legal (midnight cast on both
    # sides) and encodes through the same epoch-micros path
    ts_date_cmp = st.builds(
        lambda op, v: BinOp(op, Col("ts"), Lit(v)),
        st.sampled_from(CMP_OPS), dates)
    bin_cmp = st.builds(
        lambda op, v: BinOp(op, Col("b"), Lit(v)),
        st.sampled_from(CMP_OPS), blobs)
    return st.one_of(num_cmp, float_cmp, str_cmp, like, null, inlist,
                     date_cmp, ts_cmp, ts_date_cmp, bin_cmp)


predicates = st.recursive(
    leaf(),
    lambda children: st.one_of(
        st.builds(lambda a, b: BinOp("AND", a, b), children, children),
        st.builds(lambda a, b: BinOp("OR", a, b), children, children),
        st.builds(Not, children),
    ),
    max_leaves=6,
)

rows_strategy = st.lists(
    st.tuples(st.one_of(st.none(), ints), st.one_of(st.none(), strs),
              st.one_of(st.none(), dates), st.one_of(st.none(), stamps),
              st.one_of(st.none(), blobs)),
    min_size=1, max_size=24)

COLS = ["v", "t", "d", "ts", "b"]


def _ts_for_eval(v):
    """Normalize a date-or-datetime literal/value to datetime so the
    Python evaluator mirrors Spark's cast(date as timestamp)."""
    if isinstance(v, _dt.datetime) or v is None:
        return v
    return _dt.datetime(v.year, v.month, v.day)


@given(rows=rows_strategy, pred=predicates)
@settings(max_examples=300, deadline=None)
def test_pruning_never_drops_matching_rows(rows, pred):
    # build row groups + stats
    groups = [rows[i:i + RG_SIZE] for i in range(0, len(rows), RG_SIZE)]
    conn = sqlite3.connect(":memory:")
    from datafusion_async_parquet_index_spark.sources.catalog import (
        encode_value,
    )
    conn.execute(
        """CREATE TABLE s (rg INTEGER, row_count INTEGER,
           v_null_count INTEGER, v_min INTEGER, v_max INTEGER,
           t_null_count INTEGER, t_min TEXT, t_max TEXT,
           d_null_count INTEGER, d_min INTEGER, d_max INTEGER,
           ts_null_count INTEGER, ts_min INTEGER, ts_max INTEGER,
           b_null_count INTEGER, b_min BLOB, b_max BLOB)""")
    for gi, g in enumerate(groups):
        rec = [gi, len(g)]
        for ci, cat in enumerate(["int", "string", "date", "timestamp",
                                  "binary"]):
            vals = [row[ci] for row in g if row[ci] is not None]
            rec.append(sum(1 for row in g if row[ci] is None))
            rec.append(encode_value(cat, min(vals)) if vals else None)
            rec.append(encode_value(cat, max(vals)) if vals else None)
        conn.execute(
            "INSERT INTO s VALUES (" + ",".join("?" * 17) + ")", rec)

    stats_pred = PruningRewriter(SCHEMA).rewrite(pred)
    r = _SqliteStatsSql({
        "row_count": "int", "v_min": "int", "v_max": "int",
        "v_null_count": "int", "t_min": "string", "t_max": "string",
        "t_null_count": "int", "d_min": "date", "d_max": "date",
        "d_null_count": "int", "ts_min": "timestamp", "ts_max": "timestamp",
        "ts_null_count": "int", "b_min": "binary", "b_max": "binary",
        "b_null_count": "int"})
    sql = r.render(stats_pred)
    surviving = {row[0] for row in conn.execute(
        f"SELECT rg FROM s WHERE {sql}", r.params)}

    # Spark casts date literals to timestamp when compared against a
    # timestamp column; mirror that in the row-level oracle
    def eval_pred(e, row):
        if (isinstance(e, BinOp) and e.op in CMP_OPS
                and isinstance(e.left, Col) and e.left.name == "ts"
                and isinstance(e.right, Lit)):
            return _cmp(e.op, row["ts"], _ts_for_eval(e.right.value))
        if isinstance(e, BinOp) and e.op in ("AND", "OR"):
            l, r_ = eval_pred(e.left, row), eval_pred(e.right, row)
            if e.op == "AND":
                if l is False or r_ is False:
                    return False
                return None if (l is None or r_ is None) else (l and r_)
            if l is True or r_ is True:
                return True
            return None if (l is None or r_ is None) else (l or r_)
        if isinstance(e, Not):
            v = eval_pred(e.child, row)
            return None if v is None else (not v)
        return eval_row(e, row)

    for gi, g in enumerate(groups):
        has_match = any(
            eval_pred(pred, dict(zip(COLS, row))) is True
            for row in g)
        if has_match:
            assert gi in surviving, (
                f"row group {gi} with a matching row was pruned!\n"
                f"pred={pred}\nstats_pred={stats_pred}\nrows={g}")


# -- cross-type literals must degrade to conservative TRUE -----------------

def test_cross_type_literals_never_prune():
    """string col = 5, binary col = 'abc', date col < datetime(...12:30),
    int col = 'x': SQLite storage-class ordering diverges from Spark's
    implicit-cast semantics, so the rewriter must refuse to prune
    (degrade the leaf to TRUE) rather than risk a spurious FALSE."""
    rw = PruningRewriter(SCHEMA)
    cases = [
        BinOp("=", Col("t"), Lit(5)),
        BinOp("<", Col("t"), Lit(5)),
        BinOp("=", Col("b"), Lit("abc")),
        BinOp("=", Col("v"), Lit("5")),
        BinOp(">", Col("v"), Lit(b"\x00")),
        # non-midnight datetime on a DATE column truncates in the
        # catalog encoding -> unsound for range ops -> must be TRUE
        BinOp("<", Col("d"), Lit(_dt.datetime(2024, 1, 2, 12, 30))),
        BinOp("=", Col("ts"), Lit(5)),       # raw int on timestamp col
        BinOp("=", Col("v"), Lit(True)),     # bool literal
    ]
    for e in cases:
        out = rw.rewrite(e)
        assert isinstance(out, Lit) and out.value is True, (e, out)


def test_matched_type_literals_still_prune():
    """The guard must not over-fire: type-matched literals (and the legal
    date-on-timestamp cast) still produce a real stats predicate."""
    rw = PruningRewriter(SCHEMA)
    for e in [
        BinOp("=", Col("v"), Lit(5)),
        BinOp("<", Col("v"), Lit(2.5)),
        BinOp("=", Col("t"), Lit("abc")),
        BinOp("=", Col("b"), Lit(b"ab")),
        BinOp(">=", Col("ts"), Lit(_dt.datetime(2024, 6, 1, 1, 2, 3))),
        BinOp(">=", Col("ts"), Lit(_dt.date(2024, 6, 1))),
        BinOp("<=", Col("d"), Lit(_dt.date(2024, 1, 5))),
    ]:
        out = rw.rewrite(e)
        assert not (isinstance(out, Lit) and out.value is True), e
