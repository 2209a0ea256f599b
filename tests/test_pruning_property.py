"""Property-based soundness of the pruning rewrite (SURVEY §5c):

    for random data and random predicates,
    every row group containing a row that satisfies the predicate
    MUST survive pruning (over-selection allowed, under-selection never).

The predicate is evaluated row-by-row with SQL ternary-logic semantics in
pure Python; the rewrite is evaluated through the real SQLite catalog
path (same renderer the engine uses).
"""

import sqlite3

from hypothesis import given, settings, strategies as st

from datafusion_async_parquet_index_spark.plans.expr import (
    BinOp, Col, Expr, InList, IsNull, Like, Lit, Not,
)
from datafusion_async_parquet_index_spark.plans.pruning import PruningRewriter
from datafusion_async_parquet_index_spark.sources.catalog import _SqliteStatsSql

SCHEMA = {"v": "int", "t": "string", "d": "date"}
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
import datetime as _dt
dates = st.integers(0, 30).map(lambda n: _dt.date(2024, 1, 1) + _dt.timedelta(days=n))


def leaf():
    num_cmp = st.builds(
        lambda op, v: BinOp(op, Col("v"), Lit(v)),
        st.sampled_from(["=", "!=", "<", "<=", ">", ">="]), ints)
    str_cmp = st.builds(
        lambda op, v: BinOp(op, Col("t"), Lit(v)),
        st.sampled_from(["=", "!=", "<", "<=", ">", ">="]), strs)
    like = st.builds(
        lambda p, neg: Like(Col("t"), p, negated=neg),
        st.text(alphabet="ab%_", min_size=1, max_size=4), st.booleans())
    null = st.builds(
        lambda c, neg: IsNull(Col(c), negated=neg),
        st.sampled_from(["v", "t"]), st.booleans())
    inlist = st.builds(
        lambda vs: InList(Col("v"), [Lit(v) for v in vs]),
        st.lists(ints, min_size=1, max_size=3))
    date_cmp = st.builds(
        lambda op, v: BinOp(op, Col("d"), Lit(v)),
        st.sampled_from(["=", "!=", "<", "<=", ">", ">="]), dates)
    return st.one_of(num_cmp, str_cmp, like, null, inlist, date_cmp)


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
              st.one_of(st.none(), dates)),
    min_size=1, max_size=24)


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
           d_null_count INTEGER, d_min INTEGER, d_max INTEGER)""")
    for gi, g in enumerate(groups):
        vs = [v for v, _, _ in g if v is not None]
        ts = [t for _, t, _ in g if t is not None]
        ds = [d for _, _, d in g if d is not None]
        conn.execute(
            "INSERT INTO s VALUES (?,?,?,?,?,?,?,?,?,?,?)",
            (gi, len(g),
             sum(1 for v, _, _ in g if v is None),
             min(vs) if vs else None, max(vs) if vs else None,
             sum(1 for _, t, _ in g if t is None),
             min(ts) if ts else None, max(ts) if ts else None,
             sum(1 for _, _, d in g if d is None),
             encode_value("date", min(ds)) if ds else None,
             encode_value("date", max(ds)) if ds else None))

    stats_pred = PruningRewriter(SCHEMA).rewrite(pred)
    r = _SqliteStatsSql({
        "row_count": "int", "v_min": "int", "v_max": "int",
        "v_null_count": "int", "t_min": "string", "t_max": "string",
        "t_null_count": "int", "d_min": "date", "d_max": "date",
        "d_null_count": "int"})
    sql = r.render(stats_pred)
    surviving = {row[0] for row in conn.execute(
        f"SELECT rg FROM s WHERE {sql}", r.params)}

    for gi, g in enumerate(groups):
        has_match = any(
            eval_row(pred, {"v": v, "t": t, "d": d}) is True
            for v, t, d in g)
        if has_match:
            assert gi in surviving, (
                f"row group {gi} with a matching row was pruned!\n"
                f"pred={pred}\nstats_pred={stats_pred}\nrows={g}")
