"""Per-row-group Bloom filters in the external catalog.

Extension beyond the reference: its min/max index is useless for
high-cardinality unordered columns — the reference itself notes that
indexing a UUID-like column by min/max "would be pointless"
(``/root/reference/sqlx-sqlite/src/main.rs:104-118``). A small Bloom
filter per (row group, column) fixes exactly that case: equality and IN
predicates can skip row groups whose filter *definitely* lacks the value
while preserving the index's over-approximation invariant — a Bloom
filter has false positives (scan a little extra) but, built over every
non-null value, no false negatives (never skip a matching row group).

Design notes for 100 TB:

- Filters live in the catalog next to the min/max stats, sized by the
  row group's distinct count at a fixed false-positive rate, typically
  a few KB per row group — catalog size stays O(files x row_groups),
  independent of data volume.
- Building reads one column's pages per row group (unavoidable — a
  Bloom filter summarizes values, not footers); it parallelizes per
  file exactly like the footer pass and happens once per file at index
  time, never at query time.
- Probing is driver-side: k bit tests per candidate row group per
  equality literal, after the stats SQL has already pruned — cost is
  O(candidates), data-free.

Hashing: one md5 per value, split into two 64-bit halves combined with
the standard double-hashing scheme h_i = h1 + i*h2 (Kirsch &
Mitzenmacher 2006, "Less Hashing, Same Performance"), so k probes cost
one digest. Values are canonicalized per index type-category so the
probe literal hashes identically to the build value.
"""

from __future__ import annotations

import hashlib
import math
from typing import Any, Iterable, Optional, Tuple

# categories bloom filters support: exact-match types. Floats are
# excluded (equality on floats is fragile and min/max already serves
# range predicates).
BLOOM_CATEGORIES = {"int", "string", "binary", "timestamp", "date"}

DEFAULT_FPP = 0.01
MIN_BITS = 64


def canonical_bytes(category: str, v: Any) -> Optional[bytes]:
    """Stable byte form per type-category; None = value not bloomable
    (wrong type for the column => caller must NOT refine, stay sound)."""
    if v is None:
        return None
    if category == "int":
        # bool is an int subclass; reject to avoid surprising matches
        if isinstance(v, bool) or not isinstance(v, int):
            return None
        return b"i" + str(v).encode()
    if category == "string":
        if not isinstance(v, str):
            return None
        return b"s" + v.encode("utf-8")
    if category == "binary":
        if not isinstance(v, (bytes, bytearray)):
            return None
        return b"b" + bytes(v)
    if category in ("timestamp", "date"):
        # catalog.encode_value already maps datetimes/dates to ints;
        # accept the encoded integer form
        if isinstance(v, bool) or not isinstance(v, int):
            return None
        return b"t" + str(v).encode()
    return None


def bloom_params(n_values: int, fpp: float = DEFAULT_FPP) -> Tuple[int, int]:
    """(m_bits, k) for a target false-positive rate; m rounded up to a
    whole byte, k >= 1."""
    n = max(n_values, 1)
    m = max(MIN_BITS, math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _hash_pair(canon: bytes) -> Tuple[int, int]:
    d = hashlib.md5(canon).digest()
    return (int.from_bytes(d[:8], "big"),
            int.from_bytes(d[8:], "big") | 1)  # odd h2 => full coverage


def build_bloom(canon_values: Iterable[bytes], m: int, k: int) -> bytes:
    bits = bytearray(m // 8)
    for canon in canon_values:
        h1, h2 = _hash_pair(canon)
        for i in range(k):
            pos = (h1 + i * h2) % m
            bits[pos >> 3] |= 1 << (pos & 7)
    return bytes(bits)


def bloom_contains(blob: bytes, m: int, k: int, canon: bytes) -> bool:
    h1, h2 = _hash_pair(canon)
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not blob[pos >> 3] & (1 << (pos & 7)):
            return False
    return True
