from .expr import Case, Col, Expr, InList, IsNull, Like, Lit, Not, and_all, col, lit
from .pruning import PruningRewriter

__all__ = [
    "Case", "Col", "Expr", "InList", "IsNull", "Like", "Lit", "Not",
    "and_all", "col", "lit", "PruningRewriter",
]
