"""Operational CLI over the indexed-table engine.

The reference ships as a runnable binary (``cargo run`` —
sqlx-sqlite/src/main.rs:119); a user operating THIS engine needs the
same day-to-day verbs without writing a script. Every subcommand is a
thin argparse shell over the library (sources/table.py) — no logic
lives here, so the CLI can never drift from the tested API.

    python -m datafusion_async_parquet_index_spark.cli <verb> DIR [...]

Verbs:

    build DIR --columns a,b [--sum-columns x] [--dict-columns s]
              [--topk-columns k] [--catalog path.db]
        Index every parquet file under DIR (footer-only pass) into a
        fresh or existing catalog; prints the per-file stats summary.

    refresh DIR --columns a,b [--catalog path.db]
        Incremental maintenance: index new/changed files, drop deleted
        ones (size short-circuit — O(changed files)).

    snapshot DIR --columns a,b --catalog path.db
        Freeze the current indexed file set; prints the snapshot id.

    expire DIR --columns a,b --keep N --catalog path.db
        Retention: drop all but the newest N snapshots (metadata
        only); later as-of reads of expired ids raise loudly.

    query DIR --columns a,b "WHERE-clause" [--as-of N] [--limit N]
              [--catalog path.db]
        Parse the WHERE clause, prune through the index, print the
        pruning trace and the first rows.

    describe DIR --columns a,b [--catalog path.db]
        The catalog DESCRIBE readout (per-column stats completeness,
        bounds, trust flags) — pure catalog fold, no data read.

    delete DIR --columns a,b "WHERE-clause" --catalog path.db
        Row-level DELETE via deletion vectors: no file is rewritten;
        matching rows vanish from every read. Prints the count.

    update DIR --columns a,b "WHERE-clause" --set col=EXPR [--set ...]
               --catalog path.db
        Row-level UPDATE (merge-on-read): new versions land as one
        file, old versions become deletion vectors. Prints the count.

    append DIR --columns a,b SOURCE --catalog path.db
        INSERT: read rows from SOURCE (a parquet file or directory),
        land them as new data file(s) and index them. Prints the count.

    changes DIR --columns a,b SINCE UNTIL --catalog path.db
        Change data feed between two snapshot ids: every row inserted
        or deleted, tagged in _change_type.

    compact DIR --columns a,b --catalog path.db
        Materialize deletion vectors: rewrite only the DV'd files
        without their deleted rows, refresh, clear the vectors.

    status DIR --columns a,b [--catalog path.db]
        Maintenance dashboard: DV debt, small-file pressure, snapshot
        backlog — and which verb pays each down. Zero data read.

    optimize DIR --columns a,b [--target-mb 128] --catalog path.db
        Bin-pack small files into fewer, bigger ones (per directory;
        DV'd files are skipped — run compact first).

A file-backed --catalog makes the verbs compose across invocations
(build once, snapshot, keep querying as-of); without it each run
indexes into a private in-memory catalog first.
"""

from __future__ import annotations

import argparse
import sys


def _split(s):
    return [c for c in (s or "").split(",") if c]


def _table(args):
    from .session import get_spark
    from .sources.catalog import SqliteIndexCatalog
    from .sources.table import IndexedParquetTable

    spark = get_spark("cli")
    rtree = _split(getattr(args, "rtree_columns", ""))
    catalog = (SqliteIndexCatalog(args.catalog, rtree_columns=rtree)
               if args.catalog
               else SqliteIndexCatalog(rtree_columns=rtree)
               if rtree else None)
    return IndexedParquetTable(
        spark, args.dir,
        index_columns=_split(args.columns),
        catalog=catalog,
        sum_columns=_split(getattr(args, "sum_columns", "")),
        dict_columns=_split(getattr(args, "dict_columns", "")),
        topk_columns=_split(getattr(args, "topk_columns", "")),
        bloom_columns=_split(getattr(args, "bloom_columns", "")),
        # a file-backed catalog composes across invocations: attach
        # with the size short-circuit so repeat verbs cost O(changed
        # files), not a full re-index (the 'build' verb always does
        # the full pass)
        incremental_attach=bool(args.catalog and args.verb != "build"),
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m datafusion_async_parquet_index_spark.cli",
        description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="verb", required=True)

    def common(sp):
        sp.add_argument("dir")
        sp.add_argument("--columns", required=True,
                        help="comma-separated min/max index columns")
        sp.add_argument("--catalog", default=None,
                        help="file-backed SQLite catalog path")
        sp.add_argument("--sum-columns", default="")
        sp.add_argument("--dict-columns", default="")
        sp.add_argument("--topk-columns", default="")
        sp.add_argument("--bloom-columns", default="")
        sp.add_argument("--rtree-columns", default="",
                        help="numeric columns to R-tree-accelerate "
                             "planning on (SQLite catalogs)")
        sp.add_argument("--retries", type=int, default=1,
                        help="total attempts for DML verbs refused by "
                             "a concurrent writer (ConcurrentWriteError"
                             "); each retry re-plans from the new "
                             "table state with jittered backoff "
                             "(default 1 = no retry)")

    common(sub.add_parser("build"))
    common(sub.add_parser("refresh"))
    common(sub.add_parser("snapshot"))
    q = sub.add_parser("query")
    common(q)
    q.add_argument("where", help="SQL WHERE clause, e.g. \"a = 5\"")
    q.add_argument("--as-of", type=int, default=None, dest="as_of")
    q.add_argument("--limit", type=int, default=20)
    s = sub.add_parser("sql")
    common(s)
    s.add_argument("statement",
                   help="full SELECT with FROM self, e.g. "
                        "\"SELECT k, SUM(v) FROM self WHERE v > 5 "
                        "GROUP BY k\"")
    s.add_argument("--limit", type=int, default=20)
    common(sub.add_parser("describe"))
    common(sub.add_parser("status"))
    dl = sub.add_parser("delete")
    common(dl)
    dl.add_argument("where", help="SQL WHERE clause selecting rows to delete")
    ap = sub.add_parser("append")
    common(ap)
    ap.add_argument("source",
                    help="parquet file or directory to read rows from")
    ap.add_argument("--merge-schema", action="store_true",
                    help="evolve the table schema with the source's "
                         "new columns (Delta mergeSchema; default "
                         "refuses extra columns loudly)")
    ex = sub.add_parser("expire")
    common(ex)
    ex.add_argument("--keep", type=int, required=True,
                    help="number of newest snapshots to keep")
    up = sub.add_parser("update")
    common(up)
    up.add_argument("where", help="SQL WHERE clause selecting rows to update")
    up.add_argument("--set", action="append", required=True,
                    dest="assignments", metavar="COL=EXPR",
                    help="assignment, repeatable: --set cents=cents+1")
    ch = sub.add_parser("changes")
    common(ch)
    ch.add_argument("since", type=int, help="older snapshot id")
    ch.add_argument("until", type=int, help="newer snapshot id")
    ch.add_argument("--limit", type=int, default=20)
    common(sub.add_parser("compact"))
    rs = sub.add_parser("restore")
    common(rs)
    rs.add_argument("snapshot_id", type=int,
                    help="snapshot id to restore the table to")
    rs.add_argument("--force", action="store_true",
                    help="proceed even when removing files still "
                         "referenced by live newer snapshots (those "
                         "eras become irrecoverable)")
    op = sub.add_parser("optimize")
    common(op)
    op.add_argument("--target-mb", type=int, default=128,
                    dest="target_mb",
                    help="pack files smaller than this many MB")

    args = p.parse_args(argv)
    if args.verb in ("snapshot", "expire", "delete", "update", "append",
                     "changes", "compact", "optimize",
                     "restore") and not args.catalog:
        # refuse BEFORE starting Spark / indexing anything
        print(f"{args.verb} without --catalog is useless "
              "(in-memory catalogs die with the process)",
              file=sys.stderr)
        return 2
    if args.verb == "expire" and args.keep < 1:
        # keep_last <= 0 expires EVERY snapshot (a valid library call,
        # test-covered) — but from the CLI it is almost certainly a
        # typo for a positive retention count; refuse before touching
        # the catalog, matching the refuse-before-Spark posture above
        print(f"expire --keep {args.keep} would expire every snapshot; "
              "pass --keep >= 1 (use the library API for a full purge)",
              file=sys.stderr)
        return 2
    before = None
    if args.verb == "refresh" and args.catalog:
        # capture the prior file set BEFORE construction — building the
        # table over the directory already indexes whatever is on disk
        import sqlite3
        try:
            conn = sqlite3.connect(args.catalog)
            before = {r[0] for r in conn.execute(
                "SELECT file_name FROM file_statistics")}
            conn.close()
        except sqlite3.OperationalError:
            before = set()  # first run: no catalog tables yet
    t = _table(args)

    def _retry(fn):
        # DML verbs refused by a concurrent writer re-plan and retry
        # (jittered backoff) up to --retries total attempts
        from .sources.table import with_commit_retries
        return with_commit_retries(fn, max_attempts=max(1, args.retries))

    if args.verb == "build":
        files = t.catalog.all_files()
        for name, size, rgs, rows in files:
            print(f"{name}\t{size} bytes\t{rgs} row groups\t{rows} rows")
        print(f"indexed {len(files)} files")
    elif args.verb == "refresh":
        if before is None:
            before = {f[0] for f in t.catalog.all_files()}
        t.refresh()
        after = {f[0] for f in t.catalog.all_files()}
        print(f"added={sorted(after - before)} "
              f"removed={sorted(before - after)} total={len(after)}")
    elif args.verb == "snapshot":
        print(f"snapshot {t.snapshot()}")
    elif args.verb == "expire":
        expired = _retry(lambda: t.expire_snapshots(args.keep))
        print(f"expired {len(expired)} snapshots: {expired} "
              f"(kept the newest {args.keep})")
    elif args.verb == "query":
        from .plans.sql_predicate import parse_predicate
        pred = parse_predicate(args.where)
        df = t.query(pred, as_of=args.as_of)
        print(t.last_scan.describe())
        df.show(args.limit, truncate=False)
    elif args.verb == "sql":
        df = t.sql(args.statement)
        print(t.last_scan.describe())
        df.show(args.limit, truncate=False)
    elif args.verb == "delete":
        from .plans.sql_predicate import parse_predicate
        n = _retry(lambda: t.delete_where(parse_predicate(args.where)))
        print(f"deleted {n} rows "
              f"(deletion vectors on {sorted(t.catalog.get_dv_ranges())})")
    elif args.verb == "append":
        n = _retry(lambda: t.append(t.spark.read.parquet(args.source),
                                    merge_schema=args.merge_schema))
        print(f"appended {n} rows "
              f"({len(t.catalog.all_files())} files indexed)")
    elif args.verb == "update":
        from .plans.sql_predicate import parse_predicate
        assigns = {}
        for a in args.assignments:
            c, _, e = a.partition("=")
            if not _ or not c or not e:
                print(f"bad --set {a!r}: expected COL=EXPR",
                      file=sys.stderr)
                return 2
            assigns[c.strip()] = e
        n = _retry(lambda: t.update_where(parse_predicate(args.where),
                                          assigns))
        print(f"updated {n} rows "
              f"(deletion vectors on {sorted(t.catalog.get_dv_ranges())})")
    elif args.verb == "changes":
        df = t.read_changes(args.since, args.until)
        df.show(args.limit, truncate=False)
    elif args.verb == "restore":
        info = _retry(lambda: t.restore(args.snapshot_id,
                                        force=args.force))
        print(f"restored to snapshot {args.snapshot_id}: "
              f"removed {info['files_removed']} post-snapshot files, "
              f"{info['dv_files']} files carry era deletion vectors")
    elif args.verb == "compact":
        n = _retry(t.compact_deletes)
        print(f"rewrote {n} files; deletion vectors cleared")
    elif args.verb == "optimize":
        n = _retry(lambda: t.compact_small_files(
            target_bytes=args.target_mb << 20))
        files = len(t.catalog.all_files())
        print(f"packed {n} bins; {files} files remain")
    elif args.verb == "describe":
        import json
        print(json.dumps(t.describe_index(), indent=2, default=str))
    elif args.verb == "status":
        import json
        print(json.dumps(t.maintenance_report(), indent=2, default=str))
    t.spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
