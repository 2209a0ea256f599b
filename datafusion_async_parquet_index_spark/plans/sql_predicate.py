"""SQL WHERE-clause parser -> Expr AST: the SQL entry point for the
index-pruned scan path.

The reference's primary entry point is a SQL string
(``ctx.sql("SELECT ... WHERE value = 150")``,
``/root/reference/sqlx-sqlite/src/main.rs:146-149``); DataFusion parses
it and hands the provider an already-structured filter expression. In
our engine Catalyst owns full-query SQL (``spark.sql`` over registered
views), but the *index* needs the predicate as our own walkable AST
(``plans/expr.py``) before Spark ever sees it — so this module parses
the predicate grammar the engine can prune on:

    comparisons  = != <> < <= > >=        arithmetic  + - * / % << >>
    AND OR NOT   parentheses              literals    int float string
    LIKE / NOT LIKE / IN / IS [NOT] NULL / BETWEEN
    TRUE FALSE NULL / DATE 'x' / TIMESTAMP 'x'

Anything outside the grammar raises ``SqlPredicateError`` — a *parse*
failure is loud, unlike an *unprunable* construct which the rewrite
silently keeps (TRUE-fallback, conversions.rs:32,71,83). Those are
different layers: the parser accepts exactly what the AST can express,
the rewriter decides what the index can refute.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import List, Optional

from .expr import BinOp, Col, Expr, InList, Like, Lit, Not

__all__ = ["parse_predicate", "SqlPredicateError"]


class SqlPredicateError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
      | (?P<str>'(?:[^']|'')*')
      | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<op><<|>>|<=|>=|<>|!=|=|<|>|\+|-|\*|/|%|\(|\)|,)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "LIKE", "IN", "IS", "NULL", "TRUE", "FALSE",
    "BETWEEN", "DATE", "TIMESTAMP", "CASE", "WHEN", "THEN", "ELSE", "END",
}


class _Tok:
    def __init__(self, kind: str, value: str):
        self.kind = kind  # num | str | ident | kw | op
        self.value = value

    def __repr__(self):
        return f"{self.kind}:{self.value}"


def _tokenize(s: str) -> List[_Tok]:
    out: List[_Tok] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                break
            raise SqlPredicateError(
                f"unexpected character {s[pos:]!r} at offset {pos}")
        pos = m.end()
        if m.lastgroup == "ident":
            word = m.group("ident")
            if word.upper() in _KEYWORDS:
                out.append(_Tok("kw", word.upper()))
            else:
                out.append(_Tok("ident", word))
        elif m.lastgroup is not None:
            out.append(_Tok(m.lastgroup, m.group(m.lastgroup)))
    return out


class _Parser:
    def __init__(self, tokens: List[_Tok]):
        self.toks = tokens
        self.i = 0

    # -- token helpers -------------------------------------------------
    def _peek(self) -> Optional[_Tok]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self._peek()
        if t is None:
            raise SqlPredicateError("unexpected end of predicate")
        self.i += 1
        return t

    def _accept(self, kind: str, value: Optional[str] = None) -> Optional[_Tok]:
        t = self._peek()
        if t is not None and t.kind == kind and (value is None or t.value == value):
            self.i += 1
            return t
        return None

    def _expect(self, kind: str, value: Optional[str] = None) -> _Tok:
        t = self._accept(kind, value)
        if t is None:
            raise SqlPredicateError(
                f"expected {value or kind}, found {self._peek()!r}")
        return t

    # -- grammar (precedence low -> high) ------------------------------
    def parse(self) -> Expr:
        e = self._or()
        if self._peek() is not None:
            raise SqlPredicateError(f"trailing tokens at {self._peek()!r}")
        return e

    def _or(self) -> Expr:
        e = self._and()
        while self._accept("kw", "OR"):
            e = BinOp("OR", e, self._and())
        return e

    def _and(self) -> Expr:
        e = self._not()
        while self._accept("kw", "AND"):
            e = BinOp("AND", e, self._not())
        return e

    def _not(self) -> Expr:
        if self._accept("kw", "NOT"):
            return Not(self._not())
        return self._predicate()

    def _predicate(self) -> Expr:
        left = self._sum()
        t = self._peek()
        if t is None:
            return left
        if t.kind == "op" and t.value in ("=", "!=", "<>", "<", "<=", ">", ">="):
            self._next()
            op = "!=" if t.value == "<>" else t.value
            return BinOp(op, left, self._sum())
        if t.kind == "kw" and t.value == "IS":
            self._next()
            negated = self._accept("kw", "NOT") is not None
            self._expect("kw", "NULL")
            from .expr import IsNull
            return IsNull(left, negated=negated)
        negated = False
        if t.kind == "kw" and t.value == "NOT":
            nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
            if nxt is not None and nxt.kind == "kw" and nxt.value in ("LIKE", "IN", "BETWEEN"):
                self._next()
                negated = True
                t = self._peek()
        if t is not None and t.kind == "kw" and t.value == "LIKE":
            self._next()
            pat = self._expect("str")
            return Like(left, _unquote(pat.value), negated=negated)
        if t is not None and t.kind == "kw" and t.value == "IN":
            self._next()
            self._expect("op", "(")
            vals = [self._literal()]
            while self._accept("op", ","):
                vals.append(self._literal())
            self._expect("op", ")")
            e: Expr = InList(left, vals)
            return Not(e) if negated else e
        if t is not None and t.kind == "kw" and t.value == "BETWEEN":
            self._next()
            lo = self._sum()
            self._expect("kw", "AND")
            hi = self._sum()
            e = BinOp("AND", BinOp(">=", left, lo), BinOp("<=", left, hi))
            return Not(e) if negated else e
        return left

    def _sum(self) -> Expr:
        e = self._term()
        while True:
            t = self._peek()
            if t is not None and t.kind == "op" and t.value in ("+", "-", "<<", ">>"):
                self._next()
                e = BinOp(t.value, e, self._term())
            else:
                return e

    def _term(self) -> Expr:
        e = self._factor()
        while True:
            t = self._peek()
            if t is not None and t.kind == "op" and t.value in ("*", "/", "%"):
                self._next()
                e = BinOp(t.value, e, self._factor())
            else:
                return e

    def _factor(self) -> Expr:
        if self._accept("op", "-"):
            inner = self._factor()
            if isinstance(inner, Lit) and isinstance(inner.value, (int, float)):
                return Lit(-inner.value)
            return BinOp("-", Lit(0), inner)
        return self._primary()

    def _primary(self) -> Expr:
        if self._accept("op", "("):
            e = self._or()
            self._expect("op", ")")
            return e
        t = self._peek()
        if t is None:
            raise SqlPredicateError("unexpected end of predicate")
        if t.kind == "kw" and t.value == "CASE":
            return self._case()
        if t.kind in ("num", "str") or (
                t.kind == "kw" and t.value in (
                    "NULL", "TRUE", "FALSE", "DATE", "TIMESTAMP")):
            return self._literal()
        if t.kind == "ident":
            self._next()
            if t.value.lower() == "contains_token" and self._accept("op", "("):
                # contains_token(col, 'word') — the full-text token
                # predicate (plans/expr.py ContainsToken); prunes via
                # the token Bloom index when one exists
                from .expr import ContainsToken
                child = self._primary()
                self._expect("op", ",")
                word = self._literal()
                self._expect("op", ")")
                if not isinstance(word.value, str):
                    raise SqlPredicateError(
                        "contains_token expects a string literal token")
                return ContainsToken(child, word.value)
            return Col(t.value)
        raise SqlPredicateError(f"unexpected token {t!r}")

    def _case(self) -> Expr:
        """CASE WHEN cond THEN value [...] [ELSE value] END
        (searched form; reference conversions.rs:73-81)."""
        from .expr import Case
        self._expect("kw", "CASE")
        branches = []
        while self._accept("kw", "WHEN"):
            cond = self._or()
            self._expect("kw", "THEN")
            branches.append((cond, self._or()))
        if not branches:
            raise SqlPredicateError("CASE requires at least one WHEN branch")
        else_ = self._or() if self._accept("kw", "ELSE") else None
        self._expect("kw", "END")
        return Case(branches, else_)

    def _literal(self) -> Lit:
        t = self._next()
        if t.kind == "num":
            text = t.value
            if "." in text or "e" in text or "E" in text:
                return Lit(float(text))
            return Lit(int(text))
        if t.kind == "str":
            return Lit(_unquote(t.value))
        if t.kind == "kw" and t.value == "NULL":
            return Lit(None)
        if t.kind == "kw" and t.value == "TRUE":
            return Lit(True)
        if t.kind == "kw" and t.value == "FALSE":
            return Lit(False)
        if t.kind == "kw" and t.value == "DATE":
            s = _unquote(self._expect("str").value)
            return Lit(_dt.date.fromisoformat(s))
        if t.kind == "kw" and t.value == "TIMESTAMP":
            s = _unquote(self._expect("str").value)
            return Lit(_dt.datetime.fromisoformat(s))
        raise SqlPredicateError(f"expected literal, found {t!r}")


def _unquote(quoted: str) -> str:
    return quoted[1:-1].replace("''", "'")


def parse_predicate(sql: str) -> Expr:
    """Parse a SQL WHERE-clause string into the engine's Expr AST.
    Raises SqlPredicateError on anything outside the supported grammar."""
    tokens = _tokenize(sql)
    if not tokens:
        raise SqlPredicateError("empty predicate")
    return _Parser(tokens).parse()
