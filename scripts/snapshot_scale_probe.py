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


def build_file_backed(path: str, n_files: int) -> None:
    """Tier-C corpus: a FILE-backed catalog (the true multi-process
    shape — every reader/writer gets its own sqlite connection), 2 row
    groups per file, sorted non-overlapping v windows so point lookups
    are selective. Uses the same public upsert_file API as production
    maintenance."""
    cat = SqliteIndexCatalog(path, rtree_columns=("v",))
    cat.initialize({"v": "int"})
    for f in range(n_files):
        base = f * 2 * ROWS_PER_RG
        rgs = [RowGroupStats(
            row_group=rg, row_count=ROWS_PER_RG,
            columns={"v": (0, base + rg * ROWS_PER_RG,
                           base + (rg + 1) * ROWS_PER_RG - 1)})
            for rg in range(2)]
        cat.upsert_file(
            FileStats(f"f{f:07d}.parquet", 100 << 20, 2,
                      2 * ROWS_PER_RG, mtime_ns=1_000 + f,
                      footer_md5=f"md5_{f:07d}"), rgs)
    cat._conn.commit()
    cat._conn.close()


def probe_tier_c(n_files: int = 1_000_000, readers: int = 32,
                 writers: int = 4, queries_per_reader: int = 30,
                 commits_per_writer: int = 50,
                 dv_rows: int = 100_000) -> dict:
    """VERDICT r11 ask #5: the 100 TB catalog claim, measured instead
    of extrapolated — 1M files (~100 MB each = 100 TB), 100k-position
    DV state, 32 concurrent get_files readers on separate connections,
    and 4 contending optimistic-concurrency writers. Reports get_files
    p50/p99 under full read concurrency and the CAS retry rate."""
    import random
    import sqlite3
    import statistics
    import tempfile
    import threading

    from datafusion_async_parquet_index_spark.plans.expr import col
    from datafusion_async_parquet_index_spark.plans.pruning import (
        PruningRewriter,
    )
    from datafusion_async_parquet_index_spark.sources.table import (
        with_commit_retries,
    )

    path = os.path.join(tempfile.mkdtemp(prefix="catprobe_"), "cat.db")
    t0 = time.perf_counter()
    build_file_backed(path, n_files)
    build_s = time.perf_counter() - t0

    def open_cat():
        c = SqliteIndexCatalog.__new__(SqliteIndexCatalog)
        c._conn = sqlite3.connect(path, check_same_thread=False,
                                  timeout=60)
        import threading as _th
        c._lock = _th.RLock()
        c._writer_lease = _th.RLock()
        c._db_path = path          # cross-process flock lease (r13)
        c._lease_depth = 0
        c._lease_fd = None
        c.index_schema = {"v": "int"}
        c.rtree_columns = ("v",)
        c._rtree_active = ["v"]
        return c

    # 100k-position DV state: 4k files x 25 scattered positions
    t0 = time.perf_counter()
    cat0 = open_cat()
    step = max(1, n_files // (dv_rows // 25))
    n_dv = 0
    for f in range(0, n_files, step):
        cat0.upsert_dv(f"f{f:07d}.parquet", {0: list(range(0, 250, 10))})
        n_dv += 25
        if n_dv >= dv_rows:
            break
    dv_setup_s = time.perf_counter() - t0

    rewriter = PruningRewriter({"v": "int"})
    domain = n_files * 2 * ROWS_PER_RG

    # single-threaded PLAIN get_files baseline (no rtree prefilter):
    # the O(row groups) full stats scan — the number that motivates
    # the rtree at this population
    plain = []
    c0 = open_cat()
    rng0 = random.Random(7)
    for _ in range(3):
        x = rng0.randrange(domain)
        pred = rewriter.rewrite(col("v") == x)
        a = time.perf_counter()
        hits = c0.get_files(pred)
        plain.append(time.perf_counter() - a)
        assert len(hits) == 1 and len(hits[0][1]) == 1, hits

    lat: list = []
    lat_lock = threading.Lock()
    errors: list = []

    def reader(seed: int):
        rng = random.Random(seed)
        c = open_cat()
        mine = []
        try:
            # one unmeasured warmup: first-touch page-cache fill and
            # the 32-thread start burst otherwise dominate p99
            w = rng.randrange(domain)
            c.get_files(rewriter.rewrite(col("v") == w),
                        prefilter=("v", [(w, w)]))
            for _ in range(queries_per_reader):
                x = rng.randrange(domain)
                pred = rewriter.rewrite(col("v") == x)
                a = time.perf_counter()
                # the table layer's planning shape: rtree interval stab
                # prefilter + exact stats WHERE over the candidates
                hits = c.get_files(pred, prefilter=("v", [(x, x)]))
                mine.append(time.perf_counter() - a)
                assert len(hits) == 1 and len(hits[0][1]) == 1, hits
        except Exception as exc:     # pragma: no cover - diagnostics
            errors.append(repr(exc))
        with lat_lock:
            lat.extend(mine)

    retries = [0]
    commits = [0]
    cw_lock = threading.Lock()

    def writer(seed: int):
        c = open_cat()
        try:
            for _ in range(commits_per_writer):
                def attempt():
                    v0 = c.version()
                    c.commit_version(v0, "probe")
                with_commit_retries(
                    attempt, max_attempts=64, base_delay_s=0.002,
                    on_retry=lambda a, e: (cw_lock.acquire(),
                                           retries.__setitem__(
                                               0, retries[0] + 1),
                                           cw_lock.release()))
                with cw_lock:
                    commits[0] += 1
        except Exception as exc:     # pragma: no cover - diagnostics
            errors.append(repr(exc))

    # ensure the version row exists before contention starts
    cat0.initialize({"v": "int"})
    t0 = time.perf_counter()
    threads = ([threading.Thread(target=reader, args=(i,))
                for i in range(readers)]
               + [threading.Thread(target=writer, args=(1000 + i,))
                  for i in range(writers)])
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall_s = time.perf_counter() - t0

    lat.sort()
    out = {
        "tier": "C", "files": n_files, "dv_positions": n_dv,
        "readers": readers, "writers": writers,
        "build_s": round(build_s, 1),
        "dv_setup_s": round(dv_setup_s, 2),
        "db_bytes": os.path.getsize(path),
        "get_files_plain_ms": round(
            statistics.median(plain) * 1000, 2),
        "get_files_n": len(lat),
        "get_files_p50_ms": round(
            statistics.median(lat) * 1000, 2) if lat else None,
        "get_files_p99_ms": round(
            lat[int(len(lat) * 0.99) - 1] * 1000, 2) if lat else None,
        "get_files_max_ms": round(lat[-1] * 1000, 2) if lat else None,
        "cas_commits": commits[0],
        "cas_retries": retries[0],
        "cas_retry_rate": round(retries[0] / max(1, commits[0]), 3),
        "concurrent_wall_s": round(wall_s, 2),
        "errors": errors[:5],
    }
    os.remove(path)
    return out


def probe_tier_d(n_files: int = 1_000_000, pages_per_rg: int = 10,
                 rgs_per_file: int = 2) -> dict:
    """VERDICT r12 asks #4 + #7 — the PAGE TIER at catalog scale and
    onboarding ingest throughput, measured:

    - a 1M-file catalog built through the PUBLIC bulk path
      (upsert_files, round 13) WITH page rows for one opted-in column
      (pages_per_rg pages x rgs_per_file row groups per file = 20
      page rows/file -> 20M page_statistics rows at 1M files);
    - page_statistics row count and byte share (sqlite dbstat);
    - plan-shaped latency with the page tier engaged: get_files for a
      selective point predicate, then get_page_stats for the
      survivors (exactly _page_refine's catalog round-trip);
    - ingest throughput comparison: per-file upsert_file (one txn per
      file, the r12 tier-C path measured at ~400 files/s) vs the
      bulk upsert_files path, on a 2k-file sample each.
    """
    import random
    import statistics
    import tempfile

    from datafusion_async_parquet_index_spark.plans.expr import col
    from datafusion_async_parquet_index_spark.plans.pruning import (
        PruningRewriter,
    )
    from datafusion_async_parquet_index_spark.sources.page_index import (
        PageStats,
    )

    path = os.path.join(tempfile.mkdtemp(prefix="pageprobe_"), "cat.db")
    cat = SqliteIndexCatalog(path)
    cat.initialize({"v": "int"})
    rows_per_page = ROWS_PER_RG // pages_per_rg

    def gen_item(f: int):
        base = f * rgs_per_file * ROWS_PER_RG
        rgs = []
        pages = {}
        for rg in range(rgs_per_file):
            lo = base + rg * ROWS_PER_RG
            rgs.append(RowGroupStats(
                row_group=rg, row_count=ROWS_PER_RG,
                columns={"v": (0, lo, lo + ROWS_PER_RG - 1)}))
            pages[(rg, "v")] = [
                PageStats(p, p * rows_per_page, rows_per_page,
                          lo + p * rows_per_page,
                          lo + (p + 1) * rows_per_page - 1, False, 0)
                for p in range(pages_per_rg)]
        fs = FileStats(f"f{f:07d}.parquet", 100 << 20, rgs_per_file,
                       rgs_per_file * ROWS_PER_RG, mtime_ns=1_000 + f,
                       footer_md5=f"md5_{f:07d}")
        return (fs, rgs, None, None, None, None, None, None, pages)

    t0 = time.perf_counter()
    cat.upsert_files(gen_item(f) for f in range(n_files))
    bulk_build_s = time.perf_counter() - t0

    n_page_rows = cat._query(
        "SELECT COUNT(*) FROM page_statistics")[0][0]
    db_bytes = os.path.getsize(path)
    try:
        page_bytes = cat._query(
            "SELECT SUM(pgsize) FROM dbstat WHERE name IN "
            "('page_statistics', "
            "'sqlite_autoindex_page_statistics_1')")[0][0]
    except Exception:
        page_bytes = None

    # plan-shaped latency: point predicate -> surviving files ->
    # page rows for them (the _page_refine round-trip)
    rewriter = PruningRewriter({"v": "int"})
    domain = n_files * rgs_per_file * ROWS_PER_RG
    rng = random.Random(13)
    plan_lat, page_lat, pages_fetched = [], [], []
    for _ in range(30):
        x = rng.randrange(domain)
        pred = rewriter.rewrite(col("v") == x)
        a = time.perf_counter()
        hits = cat.get_files(pred)
        plan_lat.append(time.perf_counter() - a)
        names = [h[0] for h in hits]
        a = time.perf_counter()
        pg = cat.get_page_stats(names, ["v"])
        page_lat.append(time.perf_counter() - a)
        pages_fetched.append(sum(len(v) for v in pg.values()))

    # ingest throughput comparison on fresh 2k-file samples
    def sample_items(start, n):
        return [gen_item(start + i) for i in range(n)]

    items = sample_items(n_files, 2_000)
    t0 = time.perf_counter()
    for it in items:
        cat.upsert_file(it[0], it[1], pages=it[8])
    perfile_s = time.perf_counter() - t0
    items = sample_items(n_files + 2_000, 2_000)
    t0 = time.perf_counter()
    cat.upsert_files(items)
    bulk_s = time.perf_counter() - t0

    def pct(v, q):
        return statistics.quantiles(v, n=100)[q - 1]

    return {
        "tier": "D", "files": n_files,
        "page_rows": n_page_rows,
        "db_bytes": db_bytes,
        "page_statistics_bytes": page_bytes,
        "bulk_build_s": round(bulk_build_s, 1),
        "bulk_build_files_per_s": round(n_files / bulk_build_s, 1),
        "plan_get_files_ms_p50": round(
            1e3 * statistics.median(plan_lat), 3),
        "plan_get_files_ms_p99": round(1e3 * pct(plan_lat, 99), 3),
        "page_fetch_ms_p50": round(
            1e3 * statistics.median(page_lat), 3),
        "page_fetch_ms_p99": round(1e3 * pct(page_lat, 99), 3),
        "pages_fetched_mean": round(
            sum(pages_fetched) / len(pages_fetched), 1),
        "upsert_perfile_files_per_s": round(2_000 / perfile_s, 1),
        "upsert_bulk_files_per_s": round(2_000 / bulk_s, 1),
    }


if __name__ == "__main__":
    files_a = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    snaps_b = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    if len(sys.argv) > 3 and sys.argv[3] == "tierD":
        files_d = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
        print(json.dumps(probe_tier_d(files_d)))
    elif len(sys.argv) > 3 and sys.argv[3] == "tierC":
        files_c = int(sys.argv[4]) if len(sys.argv) > 4 else 1_000_000
        print(json.dumps(probe_tier_c(files_c)))
    else:
        print(json.dumps(probe_tier_a(files_a)))
        print(json.dumps(probe_tier_b(n_snapshots=snaps_b)))
