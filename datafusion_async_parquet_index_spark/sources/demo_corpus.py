"""Deterministic demo corpus — port of the reference's data generator
(``/root/reference/sqlx-sqlite/src/main.rs:325-407``), per FIXTURES.md §A.

Three Parquet files with known value ranges and forced row-group size 50,
so per-row-group min/max boundaries are known in advance and the golden
pruning traces in BASELINE.md are reproducible exactly:

    file1.parquet  values 0..100    (100 rows, 2 row groups)
    file2.parquet  values 100..200  (100 rows, 2 row groups)
    file3.parquet  values 200..3000 (2800 rows, 56 row groups)
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP_SIZE = 50  # mandatory (reference main.rs:401)

FILES: List[Tuple[str, range]] = [
    ("file1.parquet", range(0, 100)),
    ("file2.parquet", range(100, 200)),
    ("file3.parquet", range(200, 3000)),
]


def int_to_chars(n: int) -> str:
    """Bijective base-26: 1->'a', 26->'z', 27->'aa'; 0 -> '' (exact port of
    reference main.rs:377-386)."""
    out = []
    while n > 0:
        n -= 1
        out.append(chr(n % 26 + ord("a")))
        n //= 26
    return "".join(reversed(out))


def write_demo_corpus(data_dir: str) -> List[str]:
    os.makedirs(data_dir, exist_ok=True)
    paths = []
    for name, value_range in FILES:
        path = os.path.join(data_dir, name)
        values = list(value_range)
        tbl = pa.table({
            "file_name": pa.array([name] * len(values), pa.string()),
            "value": pa.array(values, pa.int32()),
            "text": pa.array([int_to_chars(v) for v in values], pa.string()),
        })
        pq.write_table(tbl, path, row_group_size=ROW_GROUP_SIZE)
        paths.append(path)
    return paths


def expected_row_group_bounds() -> Dict[str, List[Tuple[int, int]]]:
    """Per file, the exact (value_min, value_max) of each row group —
    sequential values => rg k spans 50 consecutive values."""
    out: Dict[str, List[Tuple[int, int]]] = {}
    for name, r in FILES:
        vals = list(r)
        out[name] = [
            (vals[i], vals[min(i + ROW_GROUP_SIZE, len(vals)) - 1])
            for i in range(0, len(vals), ROW_GROUP_SIZE)
        ]
    return out
