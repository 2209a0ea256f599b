"""Property-based soundness of dictionary-set row-group refinement
(table._dict_refine): for random per-row-group value multisets (with
NULLs and random cap coverage) and random =, !=, IN, NOT IN predicates
— alone and under AND — every row group containing a row that SATISFIES
the predicate (SQL ternary logic) must survive refinement.
Over-selection is allowed; under-selection never. No Spark needed: the
refinement consults only the catalog, exercised through the real SQLite
JSON round-trip."""

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_async_parquet_index_spark.plans.expr import (
    BinOp, Col, InList, Lit, Not,
)
from datafusion_async_parquet_index_spark.sources.catalog import (
    FileStats, RowGroupStats, SqliteIndexCatalog,
)
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)


class _Shim:
    def __init__(self, cat, col):
        self.catalog = cat
        self.dict_columns = (col,)
        self.index_schema = {}

    _dict_refine = IndexedParquetTable._dict_refine


_INTS = st.one_of(st.integers(min_value=0, max_value=6), st.none())
_STRS = st.one_of(st.sampled_from(["a", "b", "c", "d"]), st.none())


def _sat(row, pred):
    """SQL ternary-logic row evaluation, True only when satisfied."""
    if isinstance(pred, BinOp) and pred.op == "AND":
        l, r = _sat(row, pred.left), _sat(row, pred.right)
        return (l is True) and (r is True)
    if isinstance(pred, BinOp):
        lit = pred.right.value if isinstance(pred.right, Lit) \
            else pred.left.value
        if row is None:
            return None
        return row == lit if pred.op == "=" else row != lit
    if isinstance(pred, InList):
        if row is None:
            return None
        return row in [v.value for v in pred.values]
    if isinstance(pred, Not):
        inner = _sat(row, pred.child)
        return None if inner is None else not inner
    raise AssertionError(pred)


def _preds(col, lits):
    a, b = lits
    return [
        Col(col) == Lit(a),
        Lit(a) == Col(col),
        Col(col) != Lit(a),
        Lit(a) != Col(col),
        InList(Col(col), [Lit(a), Lit(b)]),
        Not(InList(Col(col), [Lit(a), Lit(b)])),
        Not(Col(col) == Lit(a)),
        (Col(col) != Lit(a)) & (Col(col) != Lit(b)),
        (Col(col) == Lit(a)) & Not(InList(Col(col), [Lit(b)])),
    ]


def _run(groups, lits, cap):
    cat = SqliteIndexCatalog()
    cat.initialize({})
    fs = FileStats("f.parquet", 1, len(groups), sum(len(g) for g in groups))
    rgs = [RowGroupStats(row_group=i, row_count=len(g))
           for i, g in enumerate(groups)]
    dicts = {}
    for i, g in enumerate(groups):
        cnt = Counter(v for v in g if v is not None)
        # random cap coverage: over-cap row groups record nothing
        dicts[i] = {"s": sorted(cnt.items())} if len(cnt) <= cap else {}
    cat.upsert_file(fs, rgs, dicts=dicts)
    shim = _Shim(cat, "s")
    for pred in _preds("s", lits):
        survivors = {"f.parquet": list(range(len(groups)))}
        shim._dict_refine(pred, survivors)
        kept = set(survivors.get("f.parquet", []))
        for i, g in enumerate(groups):
            if any(_sat(v, pred) is True for v in g):
                assert i in kept, (
                    pred.to_sql(), i, g, dicts[i], kept)


@settings(max_examples=150, deadline=None)
@given(
    groups=st.lists(st.lists(_INTS, min_size=0, max_size=12),
                    min_size=1, max_size=4),
    lits=st.tuples(st.integers(min_value=0, max_value=7),
                   st.integers(min_value=0, max_value=7)),
    cap=st.integers(min_value=1, max_value=8),
)
def test_int_dict_refine_never_under_selects(groups, lits, cap):
    _run(groups, list(lits), cap)


@settings(max_examples=150, deadline=None)
@given(
    groups=st.lists(st.lists(_STRS, min_size=0, max_size=12),
                    min_size=1, max_size=4),
    lits=st.tuples(st.sampled_from(["a", "b", "c", "d", "z"]),
                   st.sampled_from(["a", "b", "c", "d", "z"])),
    cap=st.integers(min_value=1, max_value=5),
)
def test_string_dict_refine_never_under_selects(groups, lits, cap):
    _run(groups, list(lits), cap)


# -- R-tree prefilter: decision identity under fuzz -------------------------

from hypothesis import strategies as _st

from datafusion_async_parquet_index_spark.plans.pruning import (
    PruningRewriter,
)


class _TblShim:
    """Just enough of IndexedParquetTable for _rtree_window + plan."""

    def __init__(self, cat, schema):
        self.catalog = cat
        self.index_schema = schema

    _rtree_window = IndexedParquetTable._rtree_window
    _RTREE_MAX_STABS = IndexedParquetTable._RTREE_MAX_STABS


def _mk_catalogs(groups):
    out = []
    for rtree in (False, True):
        cat = SqliteIndexCatalog(rtree_columns=("v",) if rtree else ())
        cat.initialize({"v": "int"})
        fs = FileStats("f.parquet", 1, len(groups), 0)
        rgs = []
        for i, g in enumerate(groups):
            vals = [v for v in g if v is not None]
            rgs.append(RowGroupStats(
                row_group=i, row_count=len(g),
                columns={"v": (len(g) - len(vals),
                               min(vals) if vals else None,
                               max(vals) if vals else None)}))
        cat.upsert_file(fs, rgs)
        out.append(cat)
    return out


_LIT = _st.integers(min_value=-(1 << 61), max_value=1 << 61)


def _preds_strategy():
    leaf = _st.one_of(
        _st.tuples(_st.sampled_from(["=", "<", "<=", ">", ">="]), _LIT)
        .map(lambda t: BinOp(t[0], Col("v"), Lit(t[1]))),
        _st.lists(_LIT, min_size=1, max_size=4)
        .map(lambda vs: InList(Col("v"), [Lit(v) for v in vs])),
    )
    return _st.recursive(
        leaf,
        lambda inner: _st.tuples(
            _st.sampled_from(["AND", "OR"]), inner, inner)
        .map(lambda t: BinOp(t[0], t[1], t[2])),
        max_leaves=4)


@settings(max_examples=150, deadline=None)
@given(
    groups=st.lists(
        st.lists(st.one_of(st.integers(min_value=-(1 << 60),
                                       max_value=1 << 60), st.none()),
                 min_size=0, max_size=6),
        min_size=1, max_size=5),
    pred=_preds_strategy(),
)
def test_rtree_prefilter_decision_identical_fuzz(groups, pred):
    """For arbitrary int64 row-group populations (incl. all-null
    unknown-bounds groups) and arbitrary comparison/IN/AND/OR
    predicates, the rtree-prefiltered plan equals the plain plan —
    f32 widening and full-domain sentinels can add candidates, never
    drop one, and the exact SQL removes the extras."""
    plain, rt = _mk_catalogs(groups)
    rw = PruningRewriter({"v": "int"})
    sp = rw.rewrite(pred)
    shim = _TblShim(rt, {"v": "int"})
    window = shim._rtree_window(pred)
    got_plain = plain.get_files(sp)
    got_rt = (rt.get_files(sp, prefilter=window) if window is not None
              else rt.get_files(sp))
    assert got_plain == got_rt, (pred.to_sql(), window)


_FLIT = _st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e39, max_value=1e39, width=64)


def _mk_float_catalogs(groups):
    out = []
    for rtree in (False, True):
        cat = SqliteIndexCatalog(rtree_columns=("v",) if rtree else ())
        cat.initialize({"v": "float"})
        fs = FileStats("f.parquet", 1, len(groups), 0)
        rgs = []
        for i, g in enumerate(groups):
            vals = [v for v in g if v is not None]
            rgs.append(RowGroupStats(
                row_group=i, row_count=len(g),
                columns={"v": (len(g) - len(vals),
                               min(vals) if vals else None,
                               max(vals) if vals else None)}))
        cat.upsert_file(fs, rgs)
        out.append(cat)
    return out


@settings(max_examples=150, deadline=None)
@given(
    groups=st.lists(
        st.lists(st.one_of(_FLIT, st.none()), min_size=0, max_size=5),
        min_size=1, max_size=4),
    pred=_st.builds(
        lambda op, v: BinOp(op, Col("v"), Lit(v)),
        _st.sampled_from(["=", "<", "<=", ">", ">="]), _FLIT)
    | _st.builds(
        lambda a, b: (Col("v") >= Lit(min(a, b)))
        & (Col("v") <= Lit(max(a, b))), _FLIT, _FLIT),
)
def test_rtree_float_overflow_band_identity_fuzz(groups, pred):
    """FLOAT domain incl. the f32-overflow band (|v| up to 1e39, beyond
    f32 max ~3.4e38): the rtree-prefiltered plan equals the plain plan
    — outward saturation keeps every stored interval and query window
    an over-approximation, and nothing crashes on unpackable
    literals."""
    plain, rt = _mk_float_catalogs(groups)
    rw = PruningRewriter({"v": "float"})
    sp = rw.rewrite(pred)
    shim = _TblShim(rt, {"v": "float"})
    window = shim._rtree_window(pred)
    got_plain = plain.get_files(sp)
    got_rt = (rt.get_files(sp, prefilter=window) if window is not None
              else rt.get_files(sp))
    assert got_plain == got_rt, (pred.to_sql(), window)
