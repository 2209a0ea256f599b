#!/usr/bin/env python
"""Snapshot/DML catalog scaling probe (VERDICT r10 ask #6): the
planning probe (catalog_scale_probe.py) covers lookup latency; this
one measures the SNAPSHOT and DML-metadata paths at 100 TB-shaped
populations, where the costs are O(files) per snapshot and
O(snapshots) per retention sweep:

- tier A (200k files, 8 snapshots, 2k DV'd files): per-snapshot
  create cost, as-of metadata fetch (snapshot_files /
  snapshot_manifest), reconstruction-check input (file_identity),
  the restore blocker scan (snapshots_referencing — indexed — vs the
  old per-snapshot manifest walk), DV-state snapshot+restore, expire.
- tier B (5k files, 2000 snapshots): the many-snapshots axis — the
  blocker scan and expire must not walk every manifest.

No parquet involved: every measured path is pure catalog metadata.
Usage: python scripts/snapshot_scale_probe.py [files_a] [snaps_b]
Prints one JSON line per tier.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_async_parquet_index_spark.sources.catalog import (
    FileStats, RowGroupStats, SqliteIndexCatalog,
)

RGS_PER_FILE = 4
ROWS_PER_RG = 100_000


def build(n_files: int) -> SqliteIndexCatalog:
    cat = SqliteIndexCatalog()
    cat.initialize({"v": "int"})
    for f in range(n_files):
        base = f * RGS_PER_FILE * ROWS_PER_RG
        rgs = [RowGroupStats(
            row_group=rg, row_count=ROWS_PER_RG,
            columns={"v": (0, base + rg * ROWS_PER_RG,
                           base + (rg + 1) * ROWS_PER_RG - 1)})
            for rg in range(RGS_PER_FILE)]
        cat.upsert_file(
            FileStats(f"f{f:07d}.parquet", 512 << 20, RGS_PER_FILE,
                      RGS_PER_FILE * ROWS_PER_RG, mtime_ns=1_000 + f,
                      footer_md5=f"md5_{f:07d}"), rgs)
    return cat


def _timed(fn, reps: int = 3):
    best = float("inf")
    out = None
    for _ in range(reps):
        a = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - a)
    return best, out


def _blocker_walk(cat, extra_keys, after):
    """The pre-round-11 table-level blocker scan: fetch every newer
    snapshot's FULL manifest and intersect driver-side."""
    blockers = {}
    for sid in cat.snapshot_ids():
        if sid <= after:
            continue
        for key in extra_keys & set(cat.snapshot_files(sid)):
            blockers.setdefault(key, []).append(sid)
    return blockers


def probe_tier_a(n_files: int, n_snapshots: int = 8,
                 dv_files: int = 2_000) -> dict:
    t0 = time.perf_counter()
    cat = build(n_files)
    build_s = time.perf_counter() - t0

    # DV state on dv_files files, 25 ranges each (scattered deletes)
    t0 = time.perf_counter()
    step = max(1, n_files // dv_files)
    dv_names = [f"f{f:07d}.parquet" for f in range(0, n_files, step)]
    for name in dv_names[:dv_files]:
        cat.upsert_dv(name, {0: list(range(0, 250, 10))})
    dv_setup_s = time.perf_counter() - t0

    sids = []
    t0 = time.perf_counter()
    for _ in range(n_snapshots):
        sids.append(cat.create_snapshot())
    snap_create_s = (time.perf_counter() - t0) / n_snapshots

    asof_s, files_map = _timed(lambda: cat.snapshot_files(sids[0]))
    man_s, _ = _timed(lambda: cat.snapshot_manifest(sids[0]))
    ident_s, _ = _timed(lambda: cat.file_identity())
    extras = {f"f{f:07d}.parquet" for f in range(0, n_files,
                                                 n_files // 50)}
    blk_s, blk = _timed(
        lambda: cat.snapshots_referencing(extras, sids[0]))
    walk_s, blk2 = _timed(
        lambda: _blocker_walk(cat, extras, sids[0]), reps=1)
    assert blk == blk2, "indexed blocker scan disagrees with the walk"
    rdv_s, _ = _timed(lambda: cat.restore_dvs(sids[0]), reps=1)
    exp_s, expired = _timed(
        lambda: cat.expire_snapshots(keep_last=1), reps=1)
    return {
        "tier": "A", "files": n_files, "snapshots": n_snapshots,
        "dv_files": min(dv_files, len(dv_names)),
        "build_s": round(build_s, 2),
        "dv_setup_s": round(dv_setup_s, 2),
        "snapshot_create_s": round(snap_create_s, 3),
        "asof_files_ms": round(asof_s * 1000, 1),
        "manifest_ms": round(man_s * 1000, 1),
        "file_identity_ms": round(ident_s * 1000, 1),
        "blocker_indexed_ms": round(blk_s * 1000, 2),
        "blocker_walk_ms": round(walk_s * 1000, 1),
        "restore_dvs_ms": round(rdv_s * 1000, 1),
        "expire_all_but_1_s": round(exp_s, 3),
        "expired": len(expired),
    }


def probe_tier_b(n_files: int = 5_000, n_snapshots: int = 2_000) -> dict:
    cat = build(n_files)
    t0 = time.perf_counter()
    sids = [cat.create_snapshot() for _ in range(n_snapshots)]
    snap_create_s = (time.perf_counter() - t0) / n_snapshots
    extras = {f"f{f:07d}.parquet" for f in range(0, n_files,
                                                 n_files // 50)}
    blk_s, blk = _timed(
        lambda: cat.snapshots_referencing(extras, sids[0]))
    walk_s, blk2 = _timed(
        lambda: _blocker_walk(cat, extras, sids[0]), reps=1)
    assert blk == blk2, "indexed blocker scan disagrees with the walk"
    exp_s, expired = _timed(
        lambda: cat.expire_snapshots(keep_last=10), reps=1)
    return {
        "tier": "B", "files": n_files, "snapshots": n_snapshots,
        "snapshot_create_s": round(snap_create_s, 4),
        "blocker_indexed_ms": round(blk_s * 1000, 2),
        "blocker_walk_ms": round(walk_s * 1000, 1),
        "expire_all_but_10_s": round(exp_s, 3),
        "expired": len(expired),
    }


if __name__ == "__main__":
    files_a = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    snaps_b = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    print(json.dumps(probe_tier_a(files_a)))
    print(json.dumps(probe_tier_b(n_snapshots=snaps_b)))
