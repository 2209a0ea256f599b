#!/usr/bin/env python
"""Generate a deterministic 10x corpus ("sf1") from sf0.1 for the
dual-scale spot-check one decade above the driver's bench scale
(round-5 verdict ask #6 — the sf0.01->sf0.1 sweep caught round 3's
float-accumulation bug; one more decade stresses the banding/bucket
sizes the 100 TB claims rest on).

Each table is the sf0.1 table replicated 10x with keys shifted by a
replica offset, so joins stay consistent and every query's DuckDB
oracle remains exactly as valid at the new scale.  Documents keep
their text verbatim: the replicas become exact-duplicate groups of 10,
which is itself a scale stress for the dedup family (every LSH band
bucket now holds full duplicate cliques).  Embeddings replicate
verbatim too — duplicate vectors stress top-k tie-breaking (rounded
cosine desc, vec_id asc) across engines.

Writes /tmp/sf1/{documents,embeddings,orders,customer,lineitem,
nation,region,supplier,part,events}.parquet. Idempotent (skips
existing files). Run the check with:

    python scripts/vanilla_harness.py /tmp/sf1 <query ...>
"""

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
# replica count (default 10 = one decade up). The exact-duplicate
# cliques replication creates are quadratic for PAIR-MATERIALIZING
# oracle SQL (each clique of R yields R*(R-1)/2 candidate pairs in the
# DuckDB twin), so clique-heavy dedup oracles use a milder factor via
# SF1_REPLICAS while the Spark side runs the full 10x.
R = int(os.environ.get("SF1_REPLICAS", "10"))

# per-table key columns to shift by replica * (10^ceil(log10(max+1)))
SHIFT_KEYS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    # dimension tables stay single-copy: scaling facts 10x against the
    # same dims is the realistic shape (and keeps FK joins valid)
}
COPY_ONLY = ["region", "nation", "supplier", "part"]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t, keys in SHIFT_KEYS.items():
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(src) or os.path.exists(dst):
            continue
        # decimal-power offset keeps shifted keys readable and disjoint
        mx = con.execute(
            f"SELECT MAX({keys[0]}) FROM read_parquet('{src}')"
        ).fetchone()[0]
        off = 10 ** len(str(int(mx)))
        cols = [d[0] for d in con.execute(
            f"SELECT * FROM read_parquet('{src}') LIMIT 0").description]
        sel = ", ".join(
            f"{c} + i * {off} AS {c}" if c in keys else c for c in cols)
        con.execute(
            f"""COPY (SELECT {sel}
                      FROM read_parquet('{src}'), range({R}) t(i)
                      ORDER BY i, {keys[0]})
                TO '{dst}' (FORMAT PARQUET)""")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")
    for t in COPY_ONLY:
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(DST, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            con.execute(
                f"""COPY (SELECT * FROM read_parquet('{src}'))
                    TO '{dst}' (FORMAT PARQUET)""")
            print(f"{t}: copied")
    print("done:", DST)


if __name__ == "__main__":
    main()
