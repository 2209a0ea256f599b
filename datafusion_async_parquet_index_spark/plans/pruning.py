"""Refutation-sound rewrite: data-space predicate -> stats-space predicate.

Re-implements (from scratch, in Python, against our own catalog schema)
the behavior the reference gets from DataFusion's ``PruningPredicate``
(``/root/reference/sqlx-sqlite/src/index.rs:102-176`` and the CTE example
in its module doc ``index.rs:55-67``): a predicate over data columns is
rewritten into a predicate over per-row-group statistics columns
``{col}_min``, ``{col}_max``, ``{col}_null_count`` and the shared
``row_count`` column, such that

    stats-predicate is FALSE  =>  NO row in the row group can match.

The rewrite may answer TRUE spuriously (the scan re-applies the original
predicate — pruning is *Inexact*, reference ``main.rs:307-316``) but must
never answer FALSE spuriously.  Every construct we cannot reason about
degrades to constant TRUE, mirroring ``conversions.rs:32,71,83``.

Rules (v = literal, m = col_min, M = col_max, n = col_null_count,
r = row_count; all leaf terms are null-guarded, see ``_guard``):

    c =  v   ->  m <= v AND M >= v
    c != v   ->  NOT (m = v AND M = v)
    c <  v   ->  m <  v
    c <= v   ->  m <= v
    c >  v   ->  M >  v
    c >= v   ->  M >= v
    c LIKE 'p%...'  ->  M >= 'p' AND m < next('p')   (literal prefix only)
    c IS NULL       ->  n > 0
    c IS NOT NULL   ->  n < r
    c IN (v1..vk)   ->  OR of equality rewrites
    a AND b  ->  rw(a) AND rw(b)
    a OR  b  ->  rw(a) OR  rw(b)
    NOT x    ->  rw(negate(x)) when x has an exact negation, else TRUE
    (c INTOP k) CMP v  ->  interval fold onto c (depth-1 int arithmetic
             + - * << >> with literal k; exact integer inverse transforms
             plus overflow guards — see ``_fold_arith``)
    a CMP b  (both columns indexed, compatible categories) -> interval
             intersection tests, e.g. a < b -> a_min < b_max (refuted
             when every a is >= every b); see ``_rw_colcol``
    anything else (nested arithmetic, / and %, CASE, ...)
             ->  TRUE

Null-safety: a leaf term over m/M must not prune a row group whose stats
are merely *missing*.  ``_guard`` ORs in ``m IS NULL AND (n IS NULL OR
n < r)`` — stats absent but rows possibly non-null => keep.  An all-null
row group (n = r, m/M NULL) is correctly prunable for value predicates
(SQL NULL comparison -> not TRUE -> pruned) and correctly kept for
IS NULL via the null_count term.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

from .expr import (
    BinOp, Case, Col, Expr, InList, IsNull, Like, Lit, Not,
    COMPARISONS, BOOLEAN_OPS,
)

TRUE = Lit(True)

# Overflow-guard bounds for the depth-1 arithmetic fold.  The catalog's
# "int" category covers both 32- and 64-bit Spark integers; guarding at
# the *narrower* width is sound for both (a 64-bit column whose stats
# exceed the 32-bit safe range merely stays unpruned — never refuted).
_I32_MAX, _I32_MIN = 2**31 - 1, -(2**31)
_I64_MAX, _I64_MIN = 2**63 - 1, -(2**63)
# |int| <= 2^52 round-trips through double exactly; Spark's / casts
# both sides to double, so the division fold only trusts stats inside
# this range (beyond it the group is kept unconditionally)
_DBL_EXACT = 1 << 52
_FLIP_CMP = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}


def _ceildiv(a: int, b: int) -> int:
    return -((-a) // b)


def _min(c: str) -> Col:
    return Col(f"{c}_min")


def _max(c: str) -> Col:
    return Col(f"{c}_max")


def _nulls(c: str) -> Col:
    return Col(f"{c}_null_count")


def _nan(c: str) -> Col:
    return Col(f"{c}_nan_count")


def _nan_possible(c: str) -> Expr:
    """TRUE when a NaN may hide in the row group: the opt-in per-group
    NaN count (float columns only; ``nan_count_columns`` at index build)
    is unknown (NULL — footer-only builds never learn it) or positive.
    Parquet writers EXCLUDE NaN from float min/max while Spark and
    DuckDB order NaN ABOVE every value, so any max-based refutation of a
    float predicate must keep the group unless this is FALSE."""
    return _nan(c).is_null() | (_nan(c) > Lit(0))


ROW_COUNT = Col("row_count")


def _literal_compatible(category: str, v) -> bool:
    """True when comparing this Python literal against a column of the
    given catalog category has identical ordering semantics in Spark and
    in the SQLite stats store.  Cross-type predicates (string col = 5,
    date col < timestamp literal, ...) hit engine-specific implicit-cast
    rules — SQLite orders by storage class (INTEGER < TEXT < BLOB) while
    Spark casts-and-compares, so the stats predicate could answer FALSE
    for a row group that holds Spark-matching rows.  Those degrade to
    conservative TRUE by returning False here.

    A plain ``date`` on a timestamp column is exact (midnight cast on
    both sides); a ``datetime`` on a *date* column is NOT (Spark compares
    at timestamp precision, the catalog stores whole days — a non-midnight
    bound truncates and can spuriously refute ``<``/``<=``)."""
    import datetime as _dt
    import decimal as _decimal

    if isinstance(v, bool):
        return False
    if isinstance(v, _dt.datetime):
        return category == "timestamp"
    if isinstance(v, _dt.date):
        return category in ("date", "timestamp")
    if isinstance(v, _decimal.Decimal):
        # decimal stats are ulp-widened doubles; float(v) is monotone,
        # so numeric comparison in stats space stays refutation-sound
        return category == "decimal"
    if isinstance(v, (int, float)):
        return category in ("int", "float", "decimal")
    if isinstance(v, str):
        return category == "string"
    if isinstance(v, (bytes, bytearray)):
        return category == "binary"
    return False


def _is_true(e: Expr) -> bool:
    return isinstance(e, Lit) and e.value is True


def _guard(c: str, term: Expr) -> Expr:
    """Keep the row group when stats for c are missing-but-rows-nonnull."""
    missing = _min(c).is_null() & (_nulls(c).is_null() | (_nulls(c) < ROW_COUNT))
    return missing | term


def _next_prefix(prefix: str) -> Optional[str]:
    """Smallest string greater than every string starting with prefix.
    Returns None when no such bound exists (all chars are U+10FFFF)."""
    s = prefix
    while s:
        last = s[-1]
        if ord(last) < 0x10FFFF:
            return s[:-1] + chr(ord(last) + 1)
        s = s[:-1]
    return None


class PruningRewriter:
    """Rewrites a data-space Expr into a stats-space Expr.

    indexed_columns: {column_name: type_category} where type_category in
    {"int", "float", "string", "binary", "timestamp", "date"} — columns
    absent from the map are unindexed and any leaf over them is TRUE
    (reference skips unsupported types at index.rs:213-217).
    """

    def __init__(self, indexed_columns: Dict[str, str]):
        self.indexed = indexed_columns

    # -- public --------------------------------------------------------
    def rewrite(self, e: Expr) -> Expr:
        out = self._rw(e)
        return out

    # -- internals -----------------------------------------------------
    def _rw(self, e: Expr) -> Expr:
        if isinstance(e, Lit):
            # A literal predicate passes through: FALSE prunes everything
            # (reference Q5: contradictory AND answered from index alone).
            if isinstance(e.value, bool):
                return Lit(e.value)
            return TRUE
        if isinstance(e, BinOp):
            if e.op in BOOLEAN_OPS:
                l, r = self._rw(e.left), self._rw(e.right)
                if e.op == "AND":
                    if _is_true(l):
                        return r
                    if _is_true(r):
                        return l
                    return l & r
                # OR: TRUE absorbs
                if _is_true(l) or _is_true(r):
                    return TRUE
                return l | r
            if e.op in COMPARISONS:
                return self._rw_cmp(e)
            return TRUE  # arithmetic at the top level is not a predicate
        if isinstance(e, Not):
            return self._rw_not(e.child)
        if isinstance(e, IsNull):
            return self._rw_isnull(e)
        if isinstance(e, Like):
            return self._rw_like(e)
        if isinstance(e, InList):
            return self._rw_inlist(e)
        if isinstance(e, Case):
            return TRUE  # bare CASE as predicate: not a comparison
        return TRUE

    def _leaf(self, e: BinOp):
        """Normalize to (column_name, op, literal_value) or None."""
        l, r = e.left, e.right
        if isinstance(l, Lit) and isinstance(r, Col):
            e = e.flipped()
            l, r = e.left, e.right
        if not (isinstance(l, Col) and isinstance(r, Lit)):
            return None
        if l.name not in self.indexed:
            return None
        v = r.value
        if v is None:
            return None  # c = NULL is never TRUE; conservatively keep
        if isinstance(v, float) and math.isnan(v):
            # NaN literal: Spark/DuckDB order NaN above every value and
            # NaN = NaN is TRUE, but footer stats EXCLUDE NaN and SQLite
            # turns a NaN bind into NULL — no stats-space term agrees
            # with execution, so never prune on it.
            return None
        if not _literal_compatible(self.indexed[l.name], v):
            return None  # cross-type compare: engines disagree -> TRUE
        return l.name, e.op, r

    def _rw_cmp(self, e: BinOp) -> Expr:
        leaf = self._leaf(e)
        if leaf is None:
            colcol = self._rw_colcol(e)
            if colcol is not None:
                return colcol
            if isinstance(e.left, Case) or isinstance(e.right, Case):
                return self._fold_case(e)
            return self._fold_arith(e)
        c, op, v = leaf
        # Float + NaN note: a NaN row satisfies != v / > v / >= v at the
        # Spark SQL layer (NaN orders above every value) yet is
        # invisible to footer min/max. Refutation here is deliberately
        # NOT NaN-guarded: it mirrors exactly the zone-map semantics
        # Spark's own vectorized parquet reader applies to pushed
        # col-literal filters (verified: vanilla spark.read.parquet
        # drops a [7.0, NaN] group for `> 7` / `!= 7`; DuckDB's reader
        # behaves the same for the range ops) — so pruning keeps BOTH
        # scan modes in exact parity with a vanilla Spark read of the
        # same files, which is this engine's correctness contract.
        # Everything the index proves BEYOND what Spark's reader could
        # (col-col pruning, satisfaction, catalog-only answers) IS
        # NaN-guarded below, because vanilla execution would read those
        # groups and honor NaN there.
        if op == "=":
            term = (_min(c) <= v) & (_max(c) >= v)
        elif op == "!=":
            term = Not((_min(c) == v) & (_max(c) == v))
        elif op == "<":
            term = _min(c) < v
        elif op == "<=":
            term = _min(c) <= v
        elif op == ">":
            term = _max(c) > v
        elif op == ">=":
            term = _max(c) >= v
        else:
            return TRUE
        return _guard(c, term)

    # -- column-column comparison -------------------------------------
    #
    # ``a CMP b`` with BOTH columns indexed: a row group can hold a
    # satisfying row only if the stat intervals permit one —
    #
    #     a <  b   ->  a_min <  b_max   (if every a >= every b, refute)
    #     a <= b   ->  a_min <= b_max
    #     a >  b   ->  a_max >  b_min
    #     a >= b   ->  a_max >= b_min
    #     a =  b   ->  a_min <= b_max AND b_min <= a_max  (intersection)
    #     a != b   ->  NOT (both single-valued at the same value)
    #
    # Soundness notes: (1) truncated string bounds stay VALID bounds, so
    # interval tests never refute wrongly — and min == max == t proves
    # single-valuedness even under truncation, since every value then
    # sits in [t, t]. (2) All-null columns: with stats present, the
    # INTERVAL terms evaluate over NULL min/max -> not TRUE -> pruned,
    # which is correct because NULL CMP anything is never TRUE (the
    # NOT-form for != may still keep an all-null group through
    # three-valued logic — conservative, never wrong). Missing
    # stats keep the group via the per-column guards. (3) Categories
    # must order identically in Spark and the catalog: same category,
    # or the int/float numeric pair; date-vs-timestamp col pairs bail
    # (the catalog stores epoch days vs epoch micros — incomparable).

    def _rw_colcol(self, e: BinOp) -> Optional[Expr]:
        l, r = e.left, e.right
        if not (isinstance(l, Col) and isinstance(r, Col)):
            return None
        ca, cb = l.name, r.name
        ta, tb = self.indexed.get(ca), self.indexed.get(cb)
        if ta is None or tb is None:
            return TRUE  # col-col over unindexed columns: no pruning
        numeric = ("int", "float", "decimal")
        if not (ta == tb or (ta in numeric and tb in numeric)):
            return TRUE
        if ca == cb:
            # a CMP a: < > != never hold for any (non-null) row ->
            # refute everything; = <= >= cannot prune (hold wherever
            # a is non-null). NaN-safe: NaN = NaN is TRUE in Spark, so
            # NaN < NaN / != NaN are still FALSE.
            return Lit(False) if e.op in ("<", ">", "!=") else TRUE
        if e.op == "=":
            term: Expr = (_min(ca) <= _max(cb)) & (_min(cb) <= _max(ca))
        elif e.op == "!=":
            term = Not((_min(ca) == _max(ca)) & (_min(cb) == _max(cb))
                       & (_min(ca) == _min(cb)))
        elif e.op == "<":
            term = _min(ca) < _max(cb)
        elif e.op == "<=":
            term = _min(ca) <= _max(cb)
        elif e.op == ">":
            term = _max(ca) > _min(cb)
        elif e.op == ">=":
            term = _max(ca) >= _min(cb)
        else:
            return TRUE
        out = _guard(ca, _guard(cb, term))
        # interval tests over NaN-less footer stats can refute a group
        # whose NaN rows DO satisfy any of these ops (a < NaN, NaN > b,
        # NaN = NaN, NaN != b are all TRUE under Spark/DuckDB ordering):
        # keep the group unless the float side is proven NaN-free
        for cc, tt in ((ca, ta), (cb, tb)):
            if tt == "float":
                out = out | _nan_possible(cc)
        return out

    # -- literal-armed CASE fold --------------------------------------
    #
    # ``CASE WHEN c1 THEN v1 ... [ELSE ve] END CMP k`` with every arm
    # value a literal (the reference pushes CASE into catalog SQL,
    # conversions.rs:73-81; here it folds onto the arm conditions):
    # a row can satisfy the comparison only through the arm it takes,
    # so the stats-space rewrite is OR over arms whose literal
    # comparison holds, each guarded by the arm condition's own
    # rewrite. Soundness: reachability of WHEN-arm i is
    # over-approximated by rw(ci) (ignoring that earlier conds must be
    # false — a superset, never prunes wrongly); the ELSE arm's
    # reachability is over-approximated as TRUE; a NULL arm value (or
    # a missing ELSE, which yields NULL) never satisfies any
    # comparison and contributes FALSE under every op, which keeps the
    # fold correct when _rw_not re-enters with the negated op.
    # If NO arm can satisfy the comparison the whole predicate is
    # unsatisfiable and rewrites to FALSE (prune everything — the Q5
    # contradictory-AND treatment).

    def _fold_case(self, e: BinOp) -> Expr:
        l, r = e.left, e.right
        if isinstance(l, Lit) and isinstance(r, Case):
            e = e.flipped()
            l, r = e.left, e.right
        if not (isinstance(l, Case) and isinstance(r, Lit)):
            return TRUE
        k = r.value
        if k is None:
            return TRUE
        reachable: list = []
        for cond, val in l.branches:
            holds = self._case_arm_holds(val, e.op, k)
            if holds is None:
                return TRUE  # non-literal arm or incomparable types
            if holds:
                reachable.append(self._rw(cond))
        if l.else_ is not None:
            holds = self._case_arm_holds(l.else_, e.op, k)
            if holds is None:
                return TRUE
            if holds:
                return TRUE  # ELSE reachable in general: no pruning
        if not reachable:
            return Lit(False)
        out = reachable[0]
        for term in reachable[1:]:
            out = out | term
        return out

    @staticmethod
    def _case_arm_holds(val: Expr, op: str, k) -> Optional[bool]:
        """Exact evaluation of ``<arm literal> op k``; None = bail
        (non-literal arm, or a type pairing engines may disagree on)."""
        if not isinstance(val, Lit):
            return None
        v = val.value
        if v is None:
            return False  # NULL never satisfies a comparison
        if isinstance(v, bool) != isinstance(k, bool):
            return None
        if not isinstance(v, bool):
            num = (int, float)
            if isinstance(v, num) != isinstance(k, num):
                return None
            if not isinstance(v, num) and type(v) is not type(k):
                return None
        try:
            return {
                "=": v == k, "!=": v != k, "<": v < k,
                "<=": v <= k, ">": v > k, ">=": v >= k,
            }[op]
        except (KeyError, TypeError):
            return None

    # -- depth-1 integer arithmetic fold ------------------------------
    #
    # The reference compiles arithmetic predicates into index SQL
    # (conversions.rs:21-31); we fold the common depth-1 shape
    # ``(col INTOP literal) CMP literal`` back onto the raw column with
    # exact integer interval transforms, so e.g. ``value + 10 > 500``
    # prunes instead of scanning everything.  Soundness notes:
    #
    # * All transforms are exact over unbounded Python ints (ceil/floor
    #   division picked per comparison direction), so no rounding can
    #   spuriously refute.  Float columns / float literals never fold.
    # * Non-ANSI Spark sessions WRAP on int overflow (``a + k`` of two
    #   huge ints silently goes negative), which would break the
    #   inverse transform.  Every foldable op therefore contributes an
    #   overflow guard: a row group whose stats show any value outside
    #   the width-safe input range for that op is kept unconditionally.
    #   Guards use 32-bit bounds (see _I32_*) because the catalog does
    #   not record integer width — conservative for 64-bit columns.
    # * ``>>`` is an arithmetic shift (floor division), total and
    #   non-overflowing, so it needs no guard; ``<<`` wraps, so it
    #   guards like multiplication.  Shift amounts are limited to 0..30
    #   so Java's shift-amount masking (s & 31 vs s & 63) cannot differ
    #   between widths.
    # * ``/`` is TRUE division in Spark (both sides cast to double) —
    #   folded via exact integer thresholds t = v*k with monotone-
    #   rounding analysis; the rounding-sensitive side widens by the
    #   half-ulp window and stats beyond the double-exact range keep
    #   the group (_fold_div).  ``%`` keeps the dividend's sign with
    #   |rem| < |k| in both Spark and DuckDB — the remainder range
    #   refutes statically and the |c| < |k| identity region folds
    #   onto the raw column (_fold_mod).  ``k / c`` and ``k % c`` are
    #   non-monotone around c = 0 and degrade to TRUE.
    # * NESTED chains ``((c OP k1) OP k2 ...) CMP v`` over + - * << >>
    #   fold too (_fold_chain): exact interval preimages pull the
    #   comparison back level by level, and a single certified no-wrap
    #   window on the raw column (every level's safe input window
    #   intersected) guards the whole chain. Depth capped at
    #   _CHAIN_MAX_DEPTH; chains touching / or % degrade to TRUE.

    _FOLD_OPS = ("+", "-", "*", "<<", ">>", "/", "%")

    _CHAIN_MAX_DEPTH = 4

    def _parse_chain(self, e: Expr):
        """Normalize nested arithmetic over ONE int column into
        (column_name, [(op, k, k_left), ...] INNER-to-OUTER), or None.
        Only + - * << >> participate in chains (each has an exact
        integer interval preimage); / and % stay depth-1, handled by
        their dedicated folds."""
        ops = []
        while isinstance(e, BinOp) and e.op in ("+", "-", "*", "<<", ">>"):
            if len(ops) >= self._CHAIN_MAX_DEPTH:
                return None
            a, b = e.left, e.right
            if isinstance(b, Lit) and not isinstance(a, Lit):
                k, k_left, inner = b.value, False, a
            elif (isinstance(a, Lit) and not isinstance(b, Lit)
                  and e.op in ("+", "-", "*")):
                k, k_left, inner = a.value, True, b
            else:
                return None
            if isinstance(k, bool) or not isinstance(k, int):
                return None
            if e.op in ("<<", ">>") and not (0 <= k <= 30):
                return None
            ops.append((e.op, k, k_left))
            e = inner
        if not ops or not isinstance(e, Col):
            return None
        if self.indexed.get(e.name) != "int":
            return None
        ops.reverse()
        return e.name, ops

    def _fold_arith(self, e: BinOp) -> Expr:
        l, r = e.left, e.right
        if isinstance(l, Lit) and not isinstance(r, Lit):
            e = e.flipped()
            l, r = e.left, e.right
        if not (isinstance(l, BinOp) and l.op in self._FOLD_OPS
                and isinstance(r, Lit)):
            return TRUE
        v = r.value
        if isinstance(v, bool) or not isinstance(v, int):
            return TRUE
        # split the arithmetic node into (column, literal k, k side)
        a, b = l.left, l.right
        if isinstance(a, Col) and isinstance(b, Lit):
            c, k, k_left = a, b.value, False
        elif isinstance(a, Lit) and isinstance(b, Col) and l.op in ("+", "-", "*"):
            c, k, k_left = b, a.value, True
        elif l.op in ("+", "-", "*", "<<", ">>"):
            # NESTED arithmetic: ((c OP k1) OP k2 ...) CMP v — fold the
            # whole chain with exact interval preimages (round 5)
            return self._fold_chain(l, e.op, v)
        elif l.op in ("/", "%") and isinstance(l.left, BinOp):
            # division/modulo ON TOP of a chain
            return self._fold_outer_div_mod(l, e.op, v)
        else:
            return TRUE
        if isinstance(k, bool) or not isinstance(k, int):
            return TRUE
        if c.name not in self.indexed or self.indexed[c.name] != "int":
            return TRUE
        if l.op in ("<<", ">>") and not (0 <= k <= 30):
            return TRUE
        if l.op in ("/", "%"):
            if k == 0:
                # Spark (non-ANSI): x / 0 and x % 0 are NULL, so the
                # comparison is never TRUE -> refute every group
                return Lit(False)
            if l.op == "%":
                return self._fold_mod(c.name, k, e.op, v)
            return self._fold_div(c.name, k, e.op, v)

        if e.op == "!=":
            return self._fold_ne(c, l.op, k, k_left, v)

        # comparison -> closed interval [lo, hi] on the arithmetic value
        # (None = unbounded on that side)
        lo: Optional[int]
        hi: Optional[int]
        if e.op == "=":
            lo, hi = v, v
        elif e.op == "<":
            lo, hi = None, v - 1
        elif e.op == "<=":
            lo, hi = None, v
        elif e.op == ">":
            lo, hi = v + 1, None
        elif e.op == ">=":
            lo, hi = v, None
        else:
            return TRUE

        guards: list = []
        op = l.op
        if op == "+" or (op == "-" and not k_left):
            k2 = k if op == "+" else -k
            lo = None if lo is None else lo - k2
            hi = None if hi is None else hi - k2
            if k2 > 0:
                guards.append(_max(c.name) > Lit(_I32_MAX - k2))
            elif k2 < 0:
                guards.append(_min(c.name) < Lit(_I32_MIN - k2))
        elif op == "-":  # k - col
            lo, hi = (None if hi is None else k - hi,
                      None if lo is None else k - lo)
            guards.append(_min(c.name) < Lit(k - _I32_MAX))
            guards.append(_max(c.name) > Lit(k - _I32_MIN))
        elif op in ("*", "<<"):
            m = k if op == "*" else (1 << k)
            if m == 0:
                # 0 CMP v decided statically; col NULL -> pred not TRUE,
                # so a constant-FALSE verdict still refutes soundly.
                return Lit(self._cmp_const(0, e.op, v))
            if m < 0:
                lo, hi = (None if hi is None else _ceildiv(hi, m),
                          None if lo is None else lo // m)
                safe_lo, safe_hi = _ceildiv(_I32_MAX, m), _I32_MIN // m
            else:
                lo = None if lo is None else _ceildiv(lo, m)
                hi = None if hi is None else hi // m
                safe_lo, safe_hi = _ceildiv(_I32_MIN, m), _I32_MAX // m
            if op == "<<":
                safe_lo, safe_hi = _I32_MIN >> k, _I32_MAX >> k
            guards.append(_min(c.name) < Lit(safe_lo))
            guards.append(_max(c.name) > Lit(safe_hi))
        elif op == ">>":  # floor division by 2^k: total, no guard
            m = 1 << k
            lo = None if lo is None else lo * m
            hi = None if hi is None else hi * m + (m - 1)
        else:
            return TRUE

        # clamp to int64: bounds beyond the widest Spark int are either
        # vacuous or contradictory for any real column value
        if lo is not None and lo <= _I64_MIN:
            lo = None
        if hi is not None and hi >= _I64_MAX:
            hi = None
        if (lo is not None and lo > _I64_MAX) or (hi is not None and hi < _I64_MIN):
            term: Expr = Lit(False)
        elif lo is not None and hi is not None and lo > hi:
            term = Lit(False)
        else:
            parts = []
            if hi is not None:
                parts.append(_min(c.name) <= Lit(hi))
            if lo is not None:
                parts.append(_max(c.name) >= Lit(lo))
            if not parts:
                return TRUE
            term = parts[0]
            for p in parts[1:]:
                term = term & p
        out = _guard(c.name, term)
        for g in guards:
            out = out | g
        return out

    def _fold_ne(self, c: Col, op: str, k: int, k_left: bool, v: int) -> Expr:
        """col-expr != v: refutable only when ALL values map to v, i.e.
        the op is invertible and v has an exact preimage."""
        guards: list = []
        if op == "+" or (op == "-" and not k_left):
            k2 = k if op == "+" else -k
            target = v - k2
            if k2 > 0:
                guards.append(_max(c.name) > Lit(_I32_MAX - k2))
            elif k2 < 0:
                guards.append(_min(c.name) < Lit(_I32_MIN - k2))
        elif op == "-":  # k - col
            target = k - v
            guards.append(_min(c.name) < Lit(k - _I32_MAX))
            guards.append(_max(c.name) > Lit(k - _I32_MIN))
        elif op in ("*", "<<"):
            m = k if op == "*" else (1 << k)
            if m == 0 or v % m != 0:
                return TRUE  # wrap could still hit v -> conservative
            target = v // m
            if m < 0:
                safe_lo, safe_hi = _ceildiv(_I32_MAX, m), _I32_MIN // m
            else:
                safe_lo, safe_hi = _ceildiv(_I32_MIN, m), _I32_MAX // m
            if op == "<<":
                safe_lo, safe_hi = _I32_MIN >> k, _I32_MAX >> k
            guards.append(_min(c.name) < Lit(safe_lo))
            guards.append(_max(c.name) > Lit(safe_hi))
        else:  # >> is many-to-one: a != preimage never refutable
            return TRUE
        if not (_I64_MIN <= target <= _I64_MAX):
            # no column value maps to v -> != v holds wherever defined;
            # wrap cases are covered by the guards
            term: Expr = TRUE
        else:
            term = Not((_min(c.name) == Lit(target)) & (_max(c.name) == Lit(target)))
        out = _guard(c.name, term)
        for g in guards:
            out = out | g
        return out

    @staticmethod
    def _cmp_const(a: int, op: str, b: int) -> bool:
        return {"=": a == b, "!=": a != b, "<": a < b,
                "<=": a <= b, ">": a > b, ">=": a >= b}[op]

    def _fold_div(self, cname: str, k: int, cmp: str, v: int) -> Expr:
        """``c / k CMP v`` with TRUE-division semantics (Spark casts
        both sides to double; DuckDB's / is float division too).

        Rational analysis: c/k CMP v <-> c CMP' t with t = v*k exactly
        (direction flipped for k < 0). Double analysis: Spark computes
        fl(fl(c)/k). fl(c) = c is guaranteed by the double-exact guard;
        division rounding is MONOTONE, so for the strict side
        (eff <, eff >) the integer threshold stays exact:
        c >= t -> c/k >= v -> fl(c/k) >= fl(v) = v. The non-strict side
        can round ACROSS v from up to half an ulp away, so those
        thresholds widen by slack = ceil(|k| * ulp(v) / 2) — zero for
        every non-astronomical (k, v); any widening error only keeps
        more groups. = uses both widened sides; != refutes only the
        single-valued exact preimage and only when slack is zero."""
        if abs(k) > _DBL_EXACT or abs(v) > _DBL_EXACT:
            return TRUE
        t = v * k
        slack = math.ceil(abs(k) * math.ulp(float(v)) / 2)
        dbl_guard = ((_min(cname) < Lit(-_DBL_EXACT))
                     | (_max(cname) > Lit(_DBL_EXACT)))
        lo = hi = None
        if cmp == "=":
            lo, hi = t - slack, t + slack
        elif cmp == "!=":
            if slack or not (_I64_MIN <= t <= _I64_MAX):
                return TRUE
            term: Expr = Not((_min(cname) == Lit(t))
                             & (_max(cname) == Lit(t)))
            return _guard(cname, term) | dbl_guard
        elif cmp in _FLIP_CMP:
            eff = cmp if k > 0 else _FLIP_CMP[cmp]
            if eff == "<":
                hi = t - 1
            elif eff == "<=":
                hi = t + slack
            elif eff == ">":
                lo = t + 1
            else:  # ">="
                lo = t - slack
        else:
            return TRUE
        if lo is not None and lo <= _I64_MIN:
            lo = None
        if hi is not None and hi >= _I64_MAX:
            hi = None
        if ((lo is not None and lo > _I64_MAX)
                or (hi is not None and hi < _I64_MIN)
                or (lo is not None and hi is not None and lo > hi)):
            term = Lit(False)
        else:
            parts = []
            if hi is not None:
                parts.append(_min(cname) <= Lit(hi))
            if lo is not None:
                parts.append(_max(cname) >= Lit(lo))
            if not parts:
                return TRUE
            term = parts[0]
            for p in parts[1:]:
                term = term & p
        return _guard(cname, term) | dbl_guard

    def _fold_mod(self, cname: str, k: int, cmp: str, v: int) -> Expr:
        """``c % k CMP v``: Spark's % keeps the dividend's sign with
        |remainder| < |k| — identical in DuckDB and Java. Two prunable
        facts: (a) the remainder RANGE [-(|k|-1), |k|-1] can refute the
        whole predicate statically, no stats needed; (b) inside
        |c| <= |k|-1 the op is the IDENTITY (sign preserved), so a row
        group proven entirely inside that window takes the plain
        comparison on the raw column; any group reaching outside is
        kept unconditionally."""
        r = abs(k) - 1
        if ((cmp == "=" and not -r <= v <= r)
                or (cmp == ">" and v >= r)
                or (cmp == ">=" and v > r)
                or (cmp == "<" and v <= -r)
                or (cmp == "<=" and v < -r)):
            # NULL dividends yield a NULL remainder -> never TRUE, so a
            # constant-FALSE verdict still refutes soundly
            return Lit(False)
        ident = {
            "=": (_min(cname) <= Lit(v)) & (_max(cname) >= Lit(v)),
            "!=": Not((_min(cname) == Lit(v)) & (_max(cname) == Lit(v))),
            "<": _min(cname) < Lit(v),
            "<=": _min(cname) <= Lit(v),
            ">": _max(cname) > Lit(v),
            ">=": _max(cname) >= Lit(v),
        }.get(cmp)
        if ident is None:
            return TRUE
        outside = (_min(cname) < Lit(-r)) | (_max(cname) > Lit(r))
        return _guard(cname, outside | ident)

    # -- nested arithmetic chains (round 5) ---------------------------
    #
    # ``((c OP k1) OP k2 ...) CMP v`` with each OP in + - * << >>:
    # the comparison interval pulls back through the chain with EXACT
    # integer preimages (each op's preimage of an interval is an
    # interval, exact in both directions), valid wherever no level
    # wraps. Wrap safety is certified by ONE window R on the raw
    # column: the intersection of every level's no-wrap input window
    # pulled back to c; groups whose stats may leave R are kept
    # unconditionally (the same conservative int32-width posture as the
    # depth-1 guards — a 64-bit column with huge values merely stays
    # unpruned, never refuted).

    @staticmethod
    def _safe_window(op: str, k: int, k_left: bool):
        """No-wrap INPUT window for one op (conservative int32 result
        bounds; None = unbounded side). >> is total."""
        if op == "+":
            return (_I32_MIN - k, _I32_MAX - k)
        if op == "-":
            if k_left:  # k - x
                return (k - _I32_MAX, k - _I32_MIN)
            return (_I32_MIN + k, _I32_MAX + k)
        if op == "*":
            if k == 0:
                return (None, None)  # constant 0: never wraps
            if k > 0:
                return (_ceildiv(_I32_MIN, k), _I32_MAX // k)
            return (_ceildiv(_I32_MAX, k), _I32_MIN // k)
        if op == "<<":
            return (_I32_MIN >> k, _I32_MAX >> k)
        return (None, None)

    @staticmethod
    def _pre_interval(op: str, k: int, k_left: bool, iv):
        """EXACT integer preimage of output interval iv=(lo,hi) under
        one non-wrapping op: x maps into iv  <=>  x in the result.
        Returns "empty" when no input can reach iv."""
        if iv == "empty":
            return "empty"
        lo, hi = iv
        if op == "+":
            return (None if lo is None else lo - k,
                    None if hi is None else hi - k)
        if op == "-":
            if k_left:  # k - x in [lo, hi]  <=>  x in [k-hi, k-lo]
                return (None if hi is None else k - hi,
                        None if lo is None else k - lo)
            return (None if lo is None else lo + k,
                    None if hi is None else hi + k)
        if op in ("*", "<<"):
            m = k if op == "*" else (1 << k)
            if m == 0:
                inside = ((lo is None or lo <= 0)
                          and (hi is None or hi >= 0))
                return (None, None) if inside else "empty"
            if m > 0:
                out = (None if lo is None else _ceildiv(lo, m),
                       None if hi is None else hi // m)
            else:
                out = (None if hi is None else _ceildiv(hi, m),
                       None if lo is None else lo // m)
        else:  # >> : floor division by 2^k
            m = 1 << k
            out = (None if lo is None else lo * m,
                   None if hi is None else hi * m + (m - 1))
        olo, ohi = out
        if olo is not None and ohi is not None and olo > ohi:
            return "empty"
        return out

    @staticmethod
    def _iv_intersect(a, b):
        if a == "empty" or b == "empty":
            return "empty"
        lo = a[0] if b[0] is None else (b[0] if a[0] is None
                                        else max(a[0], b[0]))
        hi = a[1] if b[1] is None else (b[1] if a[1] is None
                                        else min(a[1], b[1]))
        if lo is not None and hi is not None and lo > hi:
            return "empty"
        return (lo, hi)

    def _fold_chain(self, l: BinOp, cmp: str, v: int) -> Expr:
        if cmp == "=":
            iv = (v, v)
        elif cmp == "<":
            iv = (None, v - 1)
        elif cmp == "<=":
            iv = (None, v)
        elif cmp == ">":
            iv = (v + 1, None)
        elif cmp == ">=":
            iv = (v, None)
        elif cmp == "!=":
            iv = ("ne", v)
        else:
            return TRUE
        return self._fold_chain_iv(l, iv)

    def _fold_chain_iv(self, l: BinOp, iv) -> Expr:
        """Shared tail of the chain folds: pull an output interval —
        (lo, hi), or ("ne", t) for exact-point refutation — back
        through the parsed chain with exact preimages, guarded by the
        certified no-wrap window."""
        parsed = self._parse_chain(l)
        if parsed is None:
            return TRUE
        cname, ops = parsed
        # certified no-wrap window R on the raw column: each level's
        # safe input window pulled back through the levels below it
        R = (None, None)
        for i, (op, k, k_left) in enumerate(ops):
            w = self._safe_window(op, k, k_left)
            for pop, pk, pkl in reversed(ops[:i]):
                w = self._pre_interval(pop, pk, pkl, w)
            R = self._iv_intersect(R, w)
            if R == "empty":
                return TRUE  # nothing is certifiably wrap-free
        guards = []
        if R[0] is not None:
            guards.append(_min(cname) < Lit(R[0]))
        if R[1] is not None:
            guards.append(_max(cname) > Lit(R[1]))

        if iv[0] == "ne":
            # exact preimage of the point: every c inside maps to it
            # and nothing outside does, so != refutes exactly the
            # single-interval-valued groups inside it
            p = (iv[1], iv[1])
            for op, k, k_left in reversed(ops):
                p = self._pre_interval(op, k, k_left, p)
            if p == "empty" or p[0] is None or p[1] is None:
                return TRUE  # no (bounded) preimage: != never refutable
            term: Expr = Not((_min(cname) >= Lit(p[0]))
                             & (_max(cname) <= Lit(p[1])))
            out = _guard(cname, term)
            for g in guards:
                out = out | g
            return out
        for op, k, k_left in reversed(ops):
            iv = self._pre_interval(op, k, k_left, iv)
        if iv == "empty":
            term = Lit(False)
        else:
            lo, hi = iv
            if lo is not None and lo <= _I64_MIN:
                lo = None
            if hi is not None and hi >= _I64_MAX:
                hi = None
            if ((lo is not None and lo > _I64_MAX)
                    or (hi is not None and hi < _I64_MIN)):
                term = Lit(False)
            else:
                parts = []
                if hi is not None:
                    parts.append(_min(cname) <= Lit(hi))
                if lo is not None:
                    parts.append(_max(cname) >= Lit(lo))
                if not parts:
                    return TRUE
                term = parts[0]
                for pt in parts[1:]:
                    term = term & pt
        out = _guard(cname, term)
        for g in guards:
            out = out | g
        return out

    def _fold_outer_div_mod(self, l: BinOp, cmp: str, v: int) -> Expr:
        """``chain(c) / k CMP v`` and ``chain(c) % k CMP v`` — division
        or modulo on TOP of an arithmetic chain. Division: the
        comparison folds to integer thresholds on the chain OUTPUT via
        the _fold_div rules, and within the certified no-wrap window
        every chain output is int32-bounded, hence double-exact — the
        separate double-exact guard of the depth-1 fold is implied.
        Modulo contributes its STATIC remainder-range refutation
        (|rem| < |k| holds for Spark's % regardless of wrap), and
        degrades otherwise."""
        k = l.right.value if isinstance(l.right, Lit) else None
        if k is None or isinstance(k, bool) or not isinstance(k, int):
            return TRUE
        if not isinstance(l.left, BinOp):
            return TRUE
        if k == 0:
            return Lit(False)  # NULL result: the comparison never holds
        if l.op == "%":
            r = abs(k) - 1
            if ((cmp == "=" and not -r <= v <= r)
                    or (cmp == ">" and v >= r)
                    or (cmp == ">=" and v > r)
                    or (cmp == "<" and v <= -r)
                    or (cmp == "<=" and v < -r)):
                return Lit(False)
            return TRUE
        # "/" — TRUE division over the chain output
        if abs(k) > _DBL_EXACT or abs(v) > _DBL_EXACT:
            return TRUE
        t = v * k
        slack = math.ceil(abs(k) * math.ulp(float(v)) / 2)
        if cmp == "=":
            iv = (t - slack, t + slack)
        elif cmp == "!=":
            if slack:
                return TRUE
            iv = ("ne", t)
        elif cmp in _FLIP_CMP:
            eff = cmp if k > 0 else _FLIP_CMP[cmp]
            iv = {"<": (None, t - 1), "<=": (None, t + slack),
                  ">": (t + 1, None), ">=": (t - slack, None)}[eff]
        else:
            return TRUE
        return self._fold_chain_iv(l.left, iv)

    def _sat_not(self, child: Expr) -> Expr:
        """Satisfaction of NOT x = satisfaction of x's exact negation;
        FALSE (unknown) when no exact negation exists."""
        if isinstance(child, Not):
            return self._sat(child.child)
        if isinstance(child, BinOp) and child.op == "AND":
            return self._sat(Not(child.left) | Not(child.right))
        if isinstance(child, BinOp) and child.op == "OR":
            return self._sat(Not(child.left) & Not(child.right))
        if isinstance(child, BinOp) and child.op in COMPARISONS:
            return self._sat(BinOp(child.negated_op(), child.left, child.right))
        if isinstance(child, IsNull):
            return self._sat(IsNull(child.child, negated=not child.negated))
        if isinstance(child, Lit) and isinstance(child.value, bool):
            return Lit(not child.value)
        return Lit(False)

    # -- satisfaction rewrite (the dual of refutation) ----------------
    #
    # ``satisfies(pred)`` is TRUE for a stats row only if EVERY row of
    # that row group satisfies pred — a sound UNDER-approximation
    # (unknown degrades to FALSE, the mirror of refutation's TRUE).
    # This is what turns COUNT(*) WHERE pred into catalog arithmetic:
    # fully-satisfying row groups contribute row_count without being
    # read; only the boundary groups (candidates minus fully-satisfying)
    # need a scan. Rules (m=min, M=max, n=null_count, r=row_count; a
    # row with NULL never satisfies a comparison, so every value leaf
    # also requires n = 0, and missing stats make the leaf NULL -> not
    # TRUE -> conservatively not-full):
    #
    #     c =  v  ->  m = v AND M = v AND n = 0
    #     c != v  ->  (M < v OR m > v) AND n = 0
    #     c <  v  ->  M <  v AND n = 0        (analogous <=, >, >=)
    #     c LIKE 'p%' -> m >= 'p' AND M < next('p') AND n = 0
    #     IS NULL -> n = r;  IS NOT NULL -> n = 0
    #     c IN (vs) -> OR over equality satisfactions (single-valued)
    #     a CMP b  -> disjoint-interval tests + both n = 0
    #     AND/OR -> AND/OR;  NOT -> satisfaction of the exact negation
    #     anything else -> FALSE

    def satisfies(self, e: Expr) -> Expr:
        return self._sat(e)

    def _sat(self, e: Expr) -> Expr:
        if isinstance(e, Lit):
            return Lit(e.value is True)
        if isinstance(e, BinOp):
            if e.op in BOOLEAN_OPS:
                l, r = self._sat(e.left), self._sat(e.right)
                return (l & r) if e.op == "AND" else (l | r)
            if e.op in COMPARISONS:
                return self._sat_cmp(e)
            return Lit(False)
        if isinstance(e, Not):
            return self._sat_not(e.child)
        if isinstance(e, IsNull):
            if not isinstance(e.child, Col) or e.child.name not in self.indexed:
                return Lit(False)
            c = e.child.name
            if e.negated:
                return _nulls(c) == Lit(0)
            return _nulls(c) == ROW_COUNT
        if isinstance(e, Like):
            return self._sat_like(e)
        if isinstance(e, InList):
            if len(e.values) > self.INLIST_PRUNE_CAP:
                # satisfaction is the under-approximation dual: "don't
                # know" is Lit(False) — the group just stays a boundary
                # group and scans (correct, never wrong)
                return Lit(False)
            out: Optional[Expr] = None
            for v in e.values:
                sub = self._sat_cmp(BinOp("=", e.child, v))
                out = sub if out is None else (out | sub)
            return out if out is not None else Lit(False)
        return Lit(False)

    def _sat_cmp(self, e: BinOp) -> Expr:
        leaf = self._leaf(e)
        if leaf is None:
            return self._sat_colcol(e)
        c, op, v = leaf
        if self.indexed[c] == "decimal":
            # decimal stats are ulp-WIDENED bounds and decimal literals
            # round to double: both moves are fine for refutation
            # (over-approx) but can claim a boundary row group "fully
            # satisfying" when its true max sits between v and
            # float(v) — so satisfaction never fires on decimals.
            # (Truncated STRING stats stay fine: truncation preserves
            # bound VALIDITY, which is all satisfaction needs.)
            return Lit(False)
        nn = _nulls(c) == Lit(0)
        if self.indexed[c] == "float" and op in ("=", "<", "<="):
            # float stats EXCLUDE NaN (a chunk [1.0, NaN] records
            # min = max = 1.0, null_count = 0) while Spark/DuckDB order
            # NaN above everything — "max <= v proves every row <= v"
            # is wrong when a NaN lurks, so these proofs additionally
            # require the opt-in NaN count to be recorded and zero.
            # (> / >= / != proofs stay sound WITHOUT it: a hidden NaN
            # satisfies those predicates anyway.)
            nn = nn & (_nan(c) == Lit(0))
        if op == "=":
            term = (_min(c) == v) & (_max(c) == v)
        elif op == "!=":
            term = (_max(c) < v) | (_min(c) > v)
        elif op == "<":
            term = _max(c) < v
        elif op == "<=":
            term = _max(c) <= v
        elif op == ">":
            term = _min(c) > v
        elif op == ">=":
            term = _min(c) >= v
        else:
            return Lit(False)
        return term & nn

    def _sat_colcol(self, e: BinOp) -> Expr:
        l, r = e.left, e.right
        if not (isinstance(l, Col) and isinstance(r, Col)):
            return Lit(False)
        ca, cb = l.name, r.name
        ta, tb = self.indexed.get(ca), self.indexed.get(cb)
        if ta is None or tb is None:
            return Lit(False)
        numeric = ("int", "float", "decimal")
        if not (ta == tb or (ta in numeric and tb in numeric)):
            return Lit(False)
        if "decimal" in (ta, tb):
            return Lit(False)  # widened bounds: see _sat_cmp
        if ca == cb:
            if e.op in ("=", "<=", ">="):
                # a CMP a holds off NULLs — NaN-safe: NaN = NaN is TRUE
                # under Spark/DuckDB ordering
                return _nulls(ca) == Lit(0)
            return Lit(False)
        nn = (_nulls(ca) == Lit(0)) & (_nulls(cb) == Lit(0))
        # NaN-blind interval proofs (see _sat_cmp): a float side must be
        # PROVEN NaN-free (opt-in count recorded and zero) before its
        # bounds can claim every row satisfies
        for cc, tt in ((ca, ta), (cb, tb)):
            if tt == "float":
                nn = nn & (_nan(cc) == Lit(0))
        if e.op == "=":
            term: Expr = ((_min(ca) == _max(ca)) & (_min(cb) == _max(cb))
                          & (_min(ca) == _min(cb)))
        elif e.op == "!=":
            term = (_max(ca) < _min(cb)) | (_min(ca) > _max(cb))
        elif e.op == "<":
            term = _max(ca) < _min(cb)
        elif e.op == "<=":
            term = _max(ca) <= _min(cb)
        elif e.op == ">":
            term = _min(ca) > _max(cb)
        elif e.op == ">=":
            term = _min(ca) >= _max(cb)
        else:
            return Lit(False)
        return term & nn

    def _sat_like(self, e: Like) -> Expr:
        if (e.negated or not isinstance(e.child, Col)
                or self.indexed.get(e.child.name) != "string"):
            return Lit(False)
        c = e.child.name
        if e.is_exact():
            return self._sat_cmp(BinOp("=", e.child, Lit(e.pattern)))
        prefix = e.literal_prefix()
        # only the pure-prefix pattern 'p%' can be proven for ALL rows
        if not prefix or e.pattern != prefix + "%":
            return Lit(False)
        nxt = _next_prefix(prefix)
        if nxt is None:
            return Lit(False)
        return ((_min(c) >= prefix) & (_max(c) < nxt)
                & (_nulls(c) == Lit(0)))

    def _rw_not(self, child: Expr) -> Expr:
        """NOT pushed down via De Morgan / comparison negation; TRUE when
        the child has no exact negation (conservative)."""
        if isinstance(child, Not):
            return self._rw(child.child)
        if isinstance(child, BinOp) and child.op == "AND":
            return self._rw(Not(child.left) | Not(child.right))
        if isinstance(child, BinOp) and child.op == "OR":
            return self._rw(Not(child.left) & Not(child.right))
        if isinstance(child, BinOp) and child.op in COMPARISONS:
            return self._rw(BinOp(child.negated_op(), child.left, child.right))
        if isinstance(child, IsNull):
            return self._rw(IsNull(child.child, negated=not child.negated))
        if isinstance(child, Like):
            return self._rw(Like(child.child, child.pattern, negated=not child.negated))
        if isinstance(child, Lit) and isinstance(child.value, bool):
            return Lit(not child.value)
        return TRUE

    def _rw_isnull(self, e: IsNull) -> Expr:
        if not isinstance(e.child, Col) or e.child.name not in self.indexed:
            return TRUE
        c = e.child.name
        if e.negated:  # IS NOT NULL: some non-null value exists
            return _nulls(c).is_null() | (_nulls(c) < ROW_COUNT)
        return _nulls(c).is_null() | (_nulls(c) > Lit(0))

    def _rw_like(self, e: Like) -> Expr:
        if not isinstance(e.child, Col) or e.child.name not in self.indexed:
            return TRUE
        c = e.child.name
        if self.indexed.get(c) != "string":
            return TRUE
        if e.negated:
            if e.is_exact():  # NOT LIKE with no wildcard == !=
                return self._rw(BinOp("!=", e.child, Lit(e.literal_prefix())))
            return TRUE
        if e.is_exact():
            return self._rw(BinOp("=", e.child, Lit(e.pattern)))
        prefix = e.literal_prefix()
        if not prefix:
            return TRUE
        term: Expr = _max(c) >= prefix
        nxt = _next_prefix(prefix)
        if nxt is not None:
            term = term & (_min(c) < nxt)
        return _guard(c, term)

    INLIST_PRUNE_CAP = 64

    def _rw_inlist(self, e: InList) -> Expr:
        if len(e.values) > self.INLIST_PRUNE_CAP:
            # a per-value OR chain beyond this size stops paying for
            # itself and the generated stats SQL gets deep enough to
            # overflow SQL parsers (SQLite's recursion limit ~ a few
            # hundred nested terms); degrade to the enclosing [min,max]
            # window — a sound over-approximation (every listed value
            # lies inside it), same cap query_join_pruned applies to
            # its harvested key lists
            try:
                vals = [v.value for v in e.values
                        if isinstance(v, Lit) and v.value is not None]
                if not vals:
                    return TRUE
                lo, hi = min(vals), max(vals)
            except TypeError:   # un-orderable / mixed literal types
                return TRUE
            return self._rw(BinOp("AND",
                                  BinOp(">=", e.child, Lit(lo)),
                                  BinOp("<=", e.child, Lit(hi))))
        out: Optional[Expr] = None
        for v in e.values:
            sub = self._rw_cmp(BinOp("=", e.child, v))
            if _is_true(sub):
                return TRUE
            out = sub if out is None else (out | sub)
        return out if out is not None else TRUE


# -- driver-side stats-space evaluation (page-index tier, round 12) ---
#
# The page refiner (sources/table.py `_page_refine`) re-uses the SAME
# refutation-sound rewrite above, but evaluates the resulting
# stats-space expression per PAGE on the driver instead of rendering it
# to catalog SQL: the surviving page set is already row-group-pruned
# (bounded planning data), so a Python walk is cheaper than a SQL
# round-trip per conjunct and works identically on every catalog
# backend. Semantics mirror the SQL engines the rendered form targets:
# three-valued logic (None = UNKNOWN), NULL-propagating comparisons and
# arithmetic, SQLite integer division/modulo (truncate toward zero,
# remainder takes the dividend's sign). ANY surprise — unsupported
# node, type mismatch, overflow — returns UNKNOWN, and the caller keeps
# the page: the evaluator can only ever refine, never drop wrongly.

def eval_stats_expr(e, env):
    """Evaluate a stats-space Expr against {stats column: value}.
    Returns True / False / None (SQL UNKNOWN). Never raises."""
    try:
        return _ev(e, env)
    except Exception:
        return None


def _ev_coerce(v):
    import datetime as _dt
    import decimal as _dec

    from ..sources.catalog import encode_value
    if isinstance(v, _dt.datetime):
        return encode_value("timestamp", v)
    if isinstance(v, _dt.date):
        return encode_value("date", v)
    if isinstance(v, _dec.Decimal):
        return float(v)
    return v


def _ev(e, env):
    from .expr import BinOp, Case, Col, InList, IsNull, Like, Lit, Not

    if isinstance(e, Lit):
        return _ev_coerce(e.value)
    if isinstance(e, Col):
        return _ev_coerce(env.get(e.name))
    if isinstance(e, Not):
        v = _ev(e.child, env)
        return None if v is None else (not v)
    if isinstance(e, IsNull):
        v = _ev(e.child, env)
        return (v is not None) if e.negated else (v is None)
    if isinstance(e, InList):
        v = _ev(e.child, env)
        if v is None:
            return None
        saw_null = False
        for lit in e.values:
            w = _ev(lit, env)
            if w is None:
                saw_null = True
            elif w == v:
                return True
        return None if saw_null else False
    if isinstance(e, Like):
        import re

        v = _ev(e.child, env)
        if v is None or not isinstance(v, str):
            return None
        pat = ("^" + "".join(
            ".*" if ch == "%" else "." if ch == "_" else re.escape(ch)
            for ch in e.pattern) + "$")
        hit = re.match(pat, v, flags=re.DOTALL) is not None
        return (not hit) if e.negated else hit
    if isinstance(e, Case):
        for cond, val in e.branches:
            c = _ev(cond, env)
            if c is True:
                return _ev(val, env)
        return _ev(e.else_, env) if e.else_ is not None else None
    if isinstance(e, BinOp):
        op = e.op
        if op == "AND":
            l, r = _ev(e.left, env), _ev(e.right, env)
            if l is False or r is False:
                return False
            if l is None or r is None:
                return None
            return True
        if op == "OR":
            l, r = _ev(e.left, env), _ev(e.right, env)
            if l is True or r is True:
                return True
            if l is None or r is None:
                return None
            return False
        l, r = _ev(e.left, env), _ev(e.right, env)
        if l is None or r is None:
            return None
        if op == "=":
            return l == r
        if op == "!=":
            return l != r
        if op == "<":
            return l < r
        if op == "<=":
            return l <= r
        if op == ">":
            return l > r
        if op == ">=":
            return l >= r
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            if isinstance(l, int) and isinstance(r, int):
                if r == 0:
                    return None           # SQL: division by zero -> NULL
                q = abs(l) // abs(r)      # truncate toward zero
                return q if (l >= 0) == (r >= 0) else -q
            return None if r == 0 else l / r
        if op == "%":
            if r == 0:
                return None
            if isinstance(l, int) and isinstance(r, int):
                q = abs(l) // abs(r)
                q = q if (l >= 0) == (r >= 0) else -q
                return l - q * r          # remainder: dividend's sign
            return None
        if op == "<<":
            return int(l) << int(r)
        if op == ">>":
            return int(l) >> int(r)
    raise TypeError(f"unsupported stats-space node {type(e).__name__}")
