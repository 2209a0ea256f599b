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
import os as _os
import sqlite3

from hypothesis import given, settings, strategies as st

from datafusion_async_parquet_index_spark.plans.expr import (
    BinOp, Case, Col, Expr, InList, IsNull, Like, Lit, Not,
)
from datafusion_async_parquet_index_spark.plans.pruning import PruningRewriter
from datafusion_async_parquet_index_spark.sources.catalog import _SqliteStatsSql

SCHEMA = {"v": "int", "w": "int", "t": "string", "d": "date",
          "ts": "timestamp", "b": "binary"}
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
    if isinstance(e, Case):
        for cond, val in e.branches:
            if eval_row(cond, row) is True:  # NULL/False falls through
                return eval_row(val, row)
        return eval_row(e.else_, row) if e.else_ is not None else None
    if isinstance(e, BinOp):
        l, r = eval_row(e.left, row), eval_row(e.right, row)
        if e.op in ("+", "-", "*", "<<", ">>", "/", "%"):
            if l is None or r is None:
                return None
            # small generated values never overflow, so Python semantics
            # match Spark's int arithmetic / Java shifts here
            if e.op == "+":
                return l + r
            if e.op == "-":
                return l - r
            if e.op == "*":
                return l * r
            if e.op == "/":
                # Spark casts both sides to double (TRUE division) and
                # yields NULL for /0 in non-ANSI mode
                return None if r == 0 else l / r
            if e.op == "%":
                # Java/Spark remainder: sign follows the DIVIDEND
                # (Python's % follows the divisor); % 0 is NULL
                if r == 0:
                    return None
                return (abs(l) % abs(r)) * (1 if l >= 0 else -1)
            return (l << r) if e.op == "<<" else (l >> r)
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
    # depth-1 integer arithmetic over the int column: the fold in
    # plans/pruning.py must be refutation-exact for these (values are
    # small enough that the int32 overflow guards never fire, so real
    # pruning — not just conservative TRUE — is exercised)
    arith_cmp = st.builds(
        lambda aop, k, k_left, op, w, flip: (
            lambda arith: BinOp(op, Lit(w), arith) if flip
            else BinOp(op, arith, Lit(w)))(
                BinOp(aop, Lit(k), Col("v")) if k_left
                else BinOp(aop, Col("v"), Lit(k))),
        st.sampled_from(["+", "-", "*"]), st.integers(-5, 5),
        st.booleans(), st.sampled_from(CMP_OPS), st.integers(-30, 30),
        st.booleans())
    shift_cmp = st.builds(
        lambda sop, k, op, w: BinOp(op, BinOp(sop, Col("v"), Lit(k)), Lit(w)),
        st.sampled_from(["<<", ">>"]), st.integers(0, 4),
        st.sampled_from(CMP_OPS), st.integers(-60, 60))
    # TRUE division (c / k, double result) and Java-sign remainder
    # (c % k) — including k = 0 (NULL result) and negative k; the folds
    # in plans/pruning.py must agree with the row evaluator's Spark
    # semantics above
    div_cmp = st.builds(
        lambda k, op, w: BinOp(op, BinOp("/", Col("v"), Lit(k)), Lit(w)),
        st.integers(-5, 5), st.sampled_from(CMP_OPS), st.integers(-12, 12))
    # depth-2 chains: ((v OP1 k1) OP2 k2) CMP w — the nested fold's
    # exact interval preimages + composed wrap window under fuzz.
    # Shift amounts stay non-negative: Java MASKS negative shift
    # amounts (s & 31/63) — semantics the rewriter degrades on and the
    # Python evaluator cannot model (<< -1 raises).
    chain_arith = st.sampled_from(["+", "-", "*", "<<", ">>"])

    def _level(o, k, kl, inner):
        k = abs(k) if o in ("<<", ">>") else k
        if kl and o in ("+", "-", "*"):
            return BinOp(o, Lit(k), inner)
        return BinOp(o, inner, Lit(k))

    chain_cmp = st.builds(
        lambda o1, k1, kl1, o2, k2, kl2, op, w: BinOp(
            op, _level(o2, k2, kl2, _level(o1, k1, kl1, Col("v"))),
            Lit(w)),
        chain_arith, st.integers(-4, 4), st.booleans(),
        chain_arith, st.integers(-4, 4), st.booleans(),
        st.sampled_from(CMP_OPS), st.integers(-40, 40))
    # division / modulo ON TOP of a chain: ((v OP k1) / k2) CMP w
    outer_div_cmp = st.builds(
        lambda o1, k1, kl1, dop, k2, op, w: BinOp(
            op, BinOp(dop, _level(o1, k1, kl1, Col("v")), Lit(k2)),
            Lit(w)),
        chain_arith, st.integers(-4, 4), st.booleans(),
        st.sampled_from(["/", "%"]), st.integers(-5, 5),
        st.sampled_from(CMP_OPS), st.integers(-12, 12))
    mod_cmp = st.builds(
        lambda k, op, w: BinOp(op, BinOp("%", Col("v"), Lit(k)), Lit(w)),
        st.integers(-5, 5), st.sampled_from(CMP_OPS), st.integers(-6, 6))
    # literal-armed CASE: the fold must agree with ternary CASE
    # evaluation (NULL arms, missing ELSE, unsatisfiable comparisons)
    case_cmp = st.builds(
        lambda cop, cv, v1, ev, has_else, op, k: BinOp(
            op,
            Case([(BinOp(cop, Col("v"), Lit(cv)), Lit(v1))],
                 Lit(ev) if has_else else None),
            Lit(k)),
        st.sampled_from(CMP_OPS), ints,
        st.one_of(st.none(), st.integers(-3, 3)),
        st.one_of(st.none(), st.integers(-3, 3)),
        st.booleans(), st.sampled_from(CMP_OPS), st.integers(-3, 3))
    # col-col comparisons over the two int columns (incl. the
    # same-column degenerate forms a < a / a != a, which must refute)
    colcol_cmp = st.builds(
        lambda op, a, b: BinOp(op, Col(a), Col(b)),
        st.sampled_from(CMP_OPS), st.sampled_from(["v", "w"]),
        st.sampled_from(["v", "w"]))
    return st.one_of(num_cmp, float_cmp, str_cmp, like, null, inlist,
                     date_cmp, ts_cmp, ts_date_cmp, bin_cmp,
                     arith_cmp, shift_cmp, div_cmp, mod_cmp,
                     chain_cmp, outer_div_cmp, case_cmp, colcol_cmp)


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
    st.tuples(st.one_of(st.none(), ints), st.one_of(st.none(), ints),
              st.one_of(st.none(), strs),
              st.one_of(st.none(), dates), st.one_of(st.none(), stamps),
              st.one_of(st.none(), blobs)),
    min_size=1, max_size=24)

COLS = ["v", "w", "t", "d", "ts", "b"]


def _ts_for_eval(v):
    """Normalize a date-or-datetime literal/value to datetime so the
    Python evaluator mirrors Spark's cast(date as timestamp)."""
    if isinstance(v, _dt.datetime) or v is None:
        return v
    return _dt.datetime(v.year, v.month, v.day)


# SPARK_GRAFT_FUZZ_EXAMPLES=3000 for a deep one-off soundness sweep
_EXAMPLES = int(_os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "300"))


@given(rows=rows_strategy, pred=predicates)
@settings(max_examples=_EXAMPLES, deadline=None)
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
           w_null_count INTEGER, w_min INTEGER, w_max INTEGER,
           t_null_count INTEGER, t_min TEXT, t_max TEXT,
           d_null_count INTEGER, d_min INTEGER, d_max INTEGER,
           ts_null_count INTEGER, ts_min INTEGER, ts_max INTEGER,
           b_null_count INTEGER, b_min BLOB, b_max BLOB)""")
    for gi, g in enumerate(groups):
        rec = [gi, len(g)]
        for ci, cat in enumerate(["int", "int", "string", "date",
                                  "timestamp", "binary"]):
            vals = [row[ci] for row in g if row[ci] is not None]
            rec.append(sum(1 for row in g if row[ci] is None))
            rec.append(encode_value(cat, min(vals)) if vals else None)
            rec.append(encode_value(cat, max(vals)) if vals else None)
        conn.execute(
            "INSERT INTO s VALUES (" + ",".join("?" * 20) + ")", rec)

    stats_pred = PruningRewriter(SCHEMA).rewrite(pred)
    r = _SqliteStatsSql({
        "row_count": "int", "v_min": "int", "v_max": "int",
        "v_null_count": "int", "w_min": "int", "w_max": "int",
        "w_null_count": "int", "t_min": "string", "t_max": "string",
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


def _surviving_groups(stats_rows, pred):
    """Render the rewritten predicate against an int-only stats table and
    return which of the given (row_count, nulls, min, max) groups survive."""
    conn = sqlite3.connect(":memory:")
    conn.execute("""CREATE TABLE s (rg INTEGER, row_count INTEGER,
                    v_null_count INTEGER, v_min INTEGER, v_max INTEGER)""")
    for gi, (rc, nulls, mn, mx) in enumerate(stats_rows):
        conn.execute("INSERT INTO s VALUES (?,?,?,?,?)", (gi, rc, nulls, mn, mx))
    stats_pred = PruningRewriter({"v": "int"}).rewrite(pred)
    r = _SqliteStatsSql({"row_count": "int", "v_min": "int",
                         "v_max": "int", "v_null_count": "int"})
    sql = r.render(stats_pred)
    return {row[0] for row in conn.execute(f"SELECT rg FROM s WHERE {sql}",
                                           r.params)}


def test_arith_fold_prunes():
    """Depth-1 arithmetic predicates actually prune (not conservative
    TRUE): groups, as (row_count, nulls, min, max)."""
    groups = [(4, 0, 0, 10), (4, 0, 100, 200), (4, 0, -50, -20)]
    # v + 10 > 500  ->  v > 490: nothing survives
    assert _surviving_groups(groups, BinOp(">", BinOp("+", Col("v"), Lit(10)),
                                           Lit(500))) == set()
    # v * 2 <= 40  ->  v <= 20: groups 0 and 2
    assert _surviving_groups(groups, BinOp("<=", BinOp("*", Col("v"), Lit(2)),
                                           Lit(40))) == {0, 2}
    # 50 - v < 0  ->  v > 50: group 1 only
    assert _surviving_groups(groups, BinOp("<", BinOp("-", Lit(50), Col("v")),
                                           Lit(0))) == {1}
    # v << 2 >= 400  ->  v >= 100: group 1
    assert _surviving_groups(groups, BinOp(">=", BinOp("<<", Col("v"), Lit(2)),
                                           Lit(400))) == {1}
    # v >> 1 = 60  ->  v in [120, 121]: group 1
    assert _surviving_groups(groups, BinOp("=", BinOp(">>", Col("v"), Lit(1)),
                                           Lit(60))) == {1}
    # v * 3 = 5: no integer preimage -> contradiction, nothing survives
    assert _surviving_groups(groups, BinOp("=", BinOp("*", Col("v"), Lit(3)),
                                           Lit(5))) == set()
    # v * 3 != 5: tautology wherever defined -> everything survives
    assert _surviving_groups(groups, BinOp("!=", BinOp("*", Col("v"), Lit(3)),
                                           Lit(5))) == {0, 1, 2}


def test_arith_fold_overflow_guard_keeps_wrapping_groups():
    """A group whose stats reach the int32 wrap range must survive even
    when the folded interval refutes it: non-ANSI Spark wraps, so
    (INT32_MAX) + 10 < 0 is TRUE row-side."""
    big = 2**31 - 1
    groups = [(4, 0, big, big), (4, 0, 0, 10)]
    # v + 10 < 0 -> folded v < -10 refutes both; guard keeps group 0
    assert _surviving_groups(groups, BinOp("<", BinOp("+", Col("v"), Lit(10)),
                                           Lit(0))) == {0}
    # v * 2 = 5 -> contradiction, but the wrap range is kept
    assert _surviving_groups(groups, BinOp("=", BinOp("*", Col("v"), Lit(3)),
                                           Lit(5))) == {0}
    # v << 1 < 0 -> folded v < 0 refutes; shift wrap guard keeps group 0
    assert _surviving_groups(groups, BinOp("<", BinOp("<<", Col("v"), Lit(1)),
                                           Lit(0))) == {0}
    # >> cannot overflow: no guard, big-stats group genuinely refutable
    assert _surviving_groups(groups, BinOp("<", BinOp(">>", Col("v"), Lit(1)),
                                           Lit(0))) == set()


def test_arith_fold_unfoldable_degrades_true():
    """Col-col arithmetic, float operands, out-of-range shifts,
    literal-over-column division/modulo, and chains containing / or %
    still degrade to TRUE."""
    rw = PruningRewriter({"v": "int"})
    cases = [
        BinOp(">", BinOp("+", Col("v"), Col("v")), Lit(5)),
        BinOp(">", BinOp("<<", Col("v"), Lit(40)), Lit(5)),   # shift > 30
        BinOp(">", BinOp("+", Col("v"), Lit(1.5)), Lit(5)),   # float k
        BinOp(">", BinOp("+", Col("v"), Lit(1)), Lit(5.5)),   # float bound
        BinOp(">", BinOp("/", Lit(10), Col("v")), Lit(5)),    # k / c
        BinOp(">", BinOp("%", Lit(10), Col("v")), Lit(5)),    # k % c
        BinOp(">", BinOp("/", Col("v"), Lit(2)), Lit(5.5)),   # float bound
        # / nested inside a chain: stays depth-1-only
        BinOp(">", BinOp("+", BinOp("/", Col("v"), Lit(2)), Lit(1)), Lit(5)),
    ]
    for e in cases:
        out = rw.rewrite(e)
        assert isinstance(out, Lit) and out.value is True, (e, out)


def test_nested_arith_chain_folds():
    """Round 5: depth-N + - * << >> chains fold with exact interval
    preimages instead of degrading to TRUE."""
    groups = [
        # (row_count, null_count, min, max)
        (4, 0, 0, 10),      # rg 0
        (4, 0, 100, 200),   # rg 1
        (4, 0, -50, -20),   # rg 2
    ]
    # (v + 1) * 2 > 300  <->  v > 149: only rg 1
    assert _surviving_groups(
        groups, BinOp(">", BinOp("*", BinOp("+", Col("v"), Lit(1)),
                                 Lit(2)), Lit(300))) == {1}
    # ((v * 2) - 10) <= -30  <->  v <= -10: only rg 2
    assert _surviving_groups(
        groups, BinOp("<=", BinOp("-", BinOp("*", Col("v"), Lit(2)),
                                  Lit(10)), Lit(-30))) == {2}
    # 100 - (v + 50) = 0  <->  v = 50... no group straddles 50 except
    # none: rg0 max 10, rg1 min 100 -> refuted everywhere
    assert _surviving_groups(
        groups, BinOp("=", BinOp("-", Lit(100),
                                 BinOp("+", Col("v"), Lit(50))),
                      Lit(0))) == set()
    # ((v >> 1) << 1) != v is col-col; instead: (v >> 1) + 1 = 6
    # <-> v in [10, 11]: only rg 0
    assert _surviving_groups(
        groups, BinOp("=", BinOp("+", BinOp(">>", Col("v"), Lit(1)),
                                 Lit(1)), Lit(6))) == {0}
    # != with an exact chain preimage: (v + 1) * 2 != 8 <-> v != 3;
    # single-valued-at-3 group refutes
    groups2 = [(4, 0, 3, 3), (4, 0, 3, 4)]
    assert _surviving_groups(
        groups2, BinOp("!=", BinOp("*", BinOp("+", Col("v"), Lit(1)),
                                   Lit(2)), Lit(8))) == {1}
    # wrap guard: a group reaching the int32 range is kept even when
    # the folded interval refutes it
    big = 2**31 - 1
    groups3 = [(4, 0, 0, big), (4, 0, 0, 10)]
    assert _surviving_groups(
        groups3, BinOp("<", BinOp("*", BinOp("+", Col("v"), Lit(1)),
                                  Lit(2)), Lit(0))) == {0}
    # division ON TOP of a chain: (v + 1) / 2 > 75 <-> v + 1 > 150
    # <-> v > 149: only rg 1
    assert _surviving_groups(
        groups, BinOp(">", BinOp("/", BinOp("+", Col("v"), Lit(1)),
                                 Lit(2)), Lit(75))) == {1}
    # modulo on top of a chain: impossible remainder refutes statically
    assert _surviving_groups(
        groups, BinOp(">=", BinOp("%", BinOp("+", Col("v"), Lit(1)),
                                  Lit(5)), Lit(9))) == set()


def test_div_mod_fold_prunes():
    """The round-5 extension: TRUE-division and remainder predicates
    produce real stats pruning, not conservative TRUE."""
    groups = [
        # (row_count, null_count, min, max)
        (4, 0, 0, 10),      # rg 0
        (4, 0, 100, 200),   # rg 1
        (4, 0, -50, -20),   # rg 2
    ]
    # v / 2 > 40  <->  v > 80: only group 1 survives
    assert _surviving_groups(
        groups, BinOp(">", BinOp("/", Col("v"), Lit(2)), Lit(40))) == {1}
    # v / -2 >= 10  <->  v <= -20: only group 2
    assert _surviving_groups(
        groups, BinOp(">=", BinOp("/", Col("v"), Lit(-2)), Lit(10))) == {2}
    # v / 3 = 50  <->  v = 150: only group 1
    assert _surviving_groups(
        groups, BinOp("=", BinOp("/", Col("v"), Lit(3)), Lit(50))) == {1}
    # v / 0 CMP anything: NULL, refutes everything
    assert _surviving_groups(
        groups, BinOp("=", BinOp("/", Col("v"), Lit(0)), Lit(1))) == set()
    # v % 7 = 9: impossible remainder, refuted with no stats at all
    assert _surviving_groups(
        groups, BinOp("=", BinOp("%", Col("v"), Lit(7)), Lit(9))) == set()
    # v % 1000 > 50: groups inside |v| < 1000 fold onto v itself
    assert _surviving_groups(
        groups, BinOp(">", BinOp("%", Col("v"), Lit(1000)), Lit(50))) == {1}
    # v % 100 > 50: group 1 reaches outside the identity window -> kept
    assert _surviving_groups(
        groups, BinOp(">", BinOp("%", Col("v"), Lit(100)), Lit(50))) == {1}
    # v % 1000 < -10: only the negative group can produce negative rems
    assert _surviving_groups(
        groups, BinOp("<", BinOp("%", Col("v"), Lit(1000)), Lit(-10))) == {2}


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


@given(rows=rows_strategy, pred=predicates)
@settings(max_examples=_EXAMPLES, deadline=None)
def test_satisfaction_never_overcounts(rows, pred):
    """The satisfaction rewrite (count-pushdown dual): a row group it
    keeps must have EVERY row satisfying the predicate — an unsound
    'full' verdict would silently inflate pushed-down counts."""
    groups = [rows[i:i + RG_SIZE] for i in range(0, len(rows), RG_SIZE)]
    conn = sqlite3.connect(":memory:")
    from datafusion_async_parquet_index_spark.sources.catalog import (
        encode_value,
    )
    conn.execute(
        """CREATE TABLE s (rg INTEGER, row_count INTEGER,
           v_null_count INTEGER, v_min INTEGER, v_max INTEGER,
           w_null_count INTEGER, w_min INTEGER, w_max INTEGER,
           t_null_count INTEGER, t_min TEXT, t_max TEXT,
           d_null_count INTEGER, d_min INTEGER, d_max INTEGER,
           ts_null_count INTEGER, ts_min INTEGER, ts_max INTEGER,
           b_null_count INTEGER, b_min BLOB, b_max BLOB)""")
    for gi, g in enumerate(groups):
        rec = [gi, len(g)]
        for ci, cat in enumerate(["int", "int", "string", "date",
                                  "timestamp", "binary"]):
            vals = [row[ci] for row in g if row[ci] is not None]
            rec.append(sum(1 for row in g if row[ci] is None))
            rec.append(encode_value(cat, min(vals)) if vals else None)
            rec.append(encode_value(cat, max(vals)) if vals else None)
        conn.execute(
            "INSERT INTO s VALUES (" + ",".join("?" * 20) + ")", rec)

    sat_pred = PruningRewriter(SCHEMA).satisfies(pred)
    r = _SqliteStatsSql({
        "row_count": "int", "v_min": "int", "v_max": "int",
        "v_null_count": "int", "w_min": "int", "w_max": "int",
        "w_null_count": "int", "t_min": "string", "t_max": "string",
        "t_null_count": "int", "d_min": "date", "d_max": "date",
        "d_null_count": "int", "ts_min": "timestamp", "ts_max": "timestamp",
        "ts_null_count": "int", "b_min": "binary", "b_max": "binary",
        "b_null_count": "int"})
    sql = r.render(sat_pred)
    full = {row[0] for row in conn.execute(
        f"SELECT rg FROM s WHERE {sql}", r.params)}

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

    for gi in full:
        for row in groups[gi]:
            assert eval_pred(pred, dict(zip(COLS, row))) is True, (
                f"satisfaction kept row group {gi} but a row fails!\n"
                f"pred={pred}\nsat={sat_pred}\nrow={row}")
