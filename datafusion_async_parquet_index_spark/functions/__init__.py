"""Cross-engine deterministic primitives.

Every pipeline operator (dedup, similarity, text analysis) must be
checkable against a DuckDB oracle, so the hash/tokenize/shingle
primitives are defined ONCE here with two symmetric renderings: a
pyspark Column expression and a SQL fragment template.  Both sides
compute bit-identical values:

- ``md5(s)``                      -> same hex string in Spark and DuckDB
- ``hash60(s)`` = int of first 15 md5 hex chars (60 bits, fits BIGINT):
  Spark ``conv(substr(md5(s),1,15),16,10)::bigint``,
  DuckDB ``('0x'||substr(md5(s),1,15))::BIGINT``  (verified equal)
- tokens: lowercase, split on ``[^a-z0-9]+``, drop empties
- shingles: character n-grams of the normalized text
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# shared constants — referenced by BOTH the Spark exprs and the SQL
# oracles so the two sides can never drift
TOKEN_SPLIT_RE = "[^a-z0-9]+"
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this", "be",
)
BPE_TOKEN_RE = "[a-z0-9]+|[^a-z0-9 ]"


# -- Spark side ------------------------------------------------------------

def norm_text(c: Column) -> Column:
    """lowercase + collapse non-alphanumerics to single spaces + trim."""
    return F.trim(F.regexp_replace(F.lower(c), TOKEN_SPLIT_RE, " "))


def tokens(c: Column) -> Column:
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def char_shingles(c: Column, n: int = 5) -> Column:
    """All character n-grams of the normalized text (with duplicates)."""
    normed = norm_text(c)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(normed) - (n - 1))),
        lambda i: F.substring(normed, i, n),
    )


def hash60(c: Column) -> Column:
    """Deterministic 60-bit integer hash, identical across engines."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def dot_double(a: Column, b: Column) -> Column:
    """Sequential-order double dot product of two equal-length arrays —
    the element/accumulation order matches the oracle's list_dot_product
    formula so values are reproducible across engines."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    """sqrt(a·a) in double. Precompute this per vector BEFORE any pair
    join: it turns 3 array aggregations per candidate pair into 1."""
    return F.sqrt(dot_double(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine over array<float>/array<double> columns, computed in double
    with per-element order preserved (matches the oracle's formula).
    Prefer dot_double/l2_norm with norms precomputed per side when this
    appears inside a pair join."""
    return dot_double(a, b) / (l2_norm(a) * l2_norm(b))


def py_hash60(s: str) -> int:
    """Driver-side twin of hash60(): int of the first 15 md5 hex chars.
    Used to fold deterministic pseudo-random constants (e.g. LSH plane
    weights) into literal arrays instead of per-row md5 evaluation."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# -- MinHash universal-hash family -----------------------------------------
# One md5 per shingle (hash60 % p), then k cheap (a_i*h + b_i) % p
# derivations — NOT k md5 calls per shingle. p = 2^31 - 1 keeps every
# intermediate product < 2^62 (no BIGINT overflow in Spark or DuckDB).

MINHASH_P = 2_147_483_647


def minhash_seed_consts(k: int):
    """[(a_i, b_i)] drawn deterministically from py_hash60 so Spark, the
    SQL oracle, and any driver-side code agree byte-for-byte."""
    return [
        (py_hash60(f"mh_a|{i}") % (MINHASH_P - 1) + 1,
         py_hash60(f"mh_b|{i}") % MINHASH_P)
        for i in range(k)
    ]


# -- SQL (DuckDB oracle) side ---------------------------------------------

def sql_tokens(col: str) -> str:
    return (f"list_filter(string_split_regex(lower({col}), "
            f"'{TOKEN_SPLIT_RE}'), t -> t != '')")


def sql_norm_text(col: str) -> str:
    return (f"trim(regexp_replace(lower({col}), '{TOKEN_SPLIT_RE}', ' ', 'g'))")


def sql_char_shingles(col: str, n: int = 5) -> str:
    normed = sql_norm_text(col)
    # i runs 1 .. length-(n-1): full n-grams only, matching the Spark
    # sequence(1, greatest(1, length - (n-1))) bound exactly
    return (f"[substr({normed}, i, {n}) "
            f"for i in range(1, greatest(1, length({normed}) - {n - 1}) + 1)]")


def sql_hash60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def sql_stopword_list() -> str:
    return "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
