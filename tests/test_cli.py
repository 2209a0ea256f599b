"""The operational CLI (cli.py) drives the tested library verbs
end-to-end: build -> snapshot -> append -> refresh -> query (current
and as-of) -> describe, composing across invocations through a
file-backed catalog. main() is invoked in-process (each call builds on
the shared session via get_spark), stdout is captured and asserted."""

import os

import pytest


@pytest.fixture()
def corpus_dir(spark, tmp_path):
    import shutil
    from pyspark.sql import functions as F
    d = str(tmp_path / "cli_data")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    tmp = d + "_tmp"
    df.filter(F.col("k") < 60).coalesce(1).write.mode(
        "overwrite").parquet(tmp)
    os.makedirs(d, exist_ok=True)
    part = next(p for p in sorted(os.listdir(tmp))
                if p.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), os.path.join(d, "a.parquet"))
    shutil.rmtree(tmp)
    return d, df


def _run(capsys, *argv):
    # spark.stop() inside main() would kill the shared test session;
    # the session factory returns the same live session and stop() is
    # monkeypatched out by the caller
    from datafusion_async_parquet_index_spark import cli
    rc = cli.main(list(argv))
    out = capsys.readouterr().out
    return rc, out


def test_cli_lifecycle(spark, corpus_dir, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    d, df = corpus_dir
    db = str(tmp_path / "cli_catalog.db")

    rc, out = _run(capsys, "build", d, "--columns", "v",
                   "--catalog", db)
    assert rc == 0 and "indexed 1 files" in out and "a.parquet" in out

    rc, out = _run(capsys, "snapshot", d, "--columns", "v",
                   "--catalog", db)
    assert rc == 0 and out.startswith("snapshot ")
    snap = int(out.split()[1])

    # append a file, refresh through the CLI
    import shutil
    from pyspark.sql import functions as F
    tmp = d + "_tmp2"
    df.filter(F.col("k") >= 60).coalesce(1).write.mode(
        "overwrite").parquet(tmp)
    part = next(p for p in sorted(os.listdir(tmp))
                if p.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), os.path.join(d, "b.parquet"))
    shutil.rmtree(tmp)
    rc, out = _run(capsys, "refresh", d, "--columns", "v",
                   "--catalog", db)
    assert rc == 0 and "added=['b.parquet']" in out and "total=2" in out

    # query current: sees both files; the trace prints
    rc, out = _run(capsys, "query", d, "--columns", "v",
                   "v >= 150", "--catalog", db, "--limit", "5")
    assert rc == 0 and "Files scanned" in out and "b.parquet" in out

    # query as-of the snapshot: the arrival is invisible, result empty
    rc, out = _run(capsys, "query", d, "--columns", "v",
                   "v >= 150", "--catalog", db, "--as-of", str(snap))
    assert rc == 0 and "b.parquet" not in out.split("Files scanned")[1]

    # full-statement SQL through the CLI (t.sql underneath)
    rc, out = _run(capsys, "sql", d, "--columns", "v",
                   "SELECT COUNT(*) AS n FROM self WHERE v >= 150",
                   "--catalog", db)
    assert rc == 0 and "Files scanned" in out

    rc, out = _run(capsys, "describe", d, "--columns", "v",
                   "--catalog", db)
    assert rc == 0 and '"v"' in out

    # snapshot without a file catalog is refused loudly
    rc, _ = _run(capsys, "snapshot", d, "--columns", "v")
    assert rc == 2


def test_cli_delete_compact(spark, corpus_dir, tmp_path, capsys,
                            monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    d, df = corpus_dir
    db = str(tmp_path / "cli_dv.db")

    rc, out = _run(capsys, "build", d, "--columns", "v",
                   "--catalog", db)
    assert rc == 0

    rc, out = _run(capsys, "delete", d, "--columns", "v",
                   "v < 10", "--catalog", db)
    assert rc == 0 and out.startswith("deleted 5 rows"), out

    # the DV persists in the file-backed catalog across invocations
    rc, out = _run(capsys, "sql", d, "--columns", "v",
                   "SELECT COUNT(*) AS n_live FROM self",
                   "--catalog", db)
    assert rc == 0 and "|55 " in out.replace("| 55", "|55 "), out

    rc, out = _run(capsys, "compact", d, "--columns", "v",
                   "--catalog", db)
    assert rc == 0 and "rewrote 1 files" in out, out

    rc, out = _run(capsys, "sql", d, "--columns", "v",
                   "SELECT COUNT(*) AS n_live FROM self",
                   "--catalog", db)
    assert rc == 0 and "|55 " in out.replace("| 55", "|55 "), out

    # delete without a file catalog is refused loudly
    rc, _ = _run(capsys, "delete", d, "--columns", "v", "v < 10")
    assert rc == 2


def test_cli_update_and_changes(spark, corpus_dir, tmp_path, capsys,
                                monkeypatch):
    """Round-8 verbs: update (merge-on-read UPDATE) and changes
    (change data feed between snapshot ids)."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    d, df = corpus_dir
    db = str(tmp_path / "cli_upd.db")

    rc, out = _run(capsys, "build", d, "--columns", "v",
                   "--catalog", db)
    assert rc == 0
    rc, out = _run(capsys, "snapshot", d, "--columns", "v",
                   "--catalog", db)
    assert rc == 0
    s0 = int(out.split()[-1])

    # v < 10 -> 5 rows (v = 0,2,4,6,8); shift them far out of range
    rc, out = _run(capsys, "update", d, "--columns", "v",
                   "v < 10", "--set", "v=v+100000", "--catalog", db)
    assert rc == 0 and out.startswith("updated 5 rows"), out

    rc, out = _run(capsys, "sql", d, "--columns", "v",
                   "SELECT COUNT(*) AS n FROM self WHERE v >= 100000",
                   "--catalog", db)
    assert rc == 0 and "|5 " in out.replace("| 5 ", "|5  "), out

    rc, out = _run(capsys, "snapshot", d, "--columns", "v",
                   "--catalog", db)
    s1 = int(out.split()[-1])

    rc, out = _run(capsys, "changes", d, "--columns", "v",
                   str(s0), str(s1), "--catalog", db, "--limit", "50")
    assert rc == 0, out
    assert out.count("delete") >= 5 and out.count("insert") >= 5, out

    # bad --set is refused before touching the table
    rc, _ = _run(capsys, "update", d, "--columns", "v",
                 "v < 10", "--set", "nonsense", "--catalog", db)
    assert rc == 2
    # update without a file catalog is refused loudly
    rc, _ = _run(capsys, "update", d, "--columns", "v",
                 "v < 10", "--set", "v=v+1")
    assert rc == 2


def test_cli_optimize(spark, corpus_dir, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    d, df = corpus_dir
    db = str(tmp_path / "cli_opt.db")
    # add a second small file so there is a bin to pack
    from pyspark.sql import functions as F
    import os as _os
    import shutil as _sh
    extra = spark.range(100, 160).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    tmp = d + "_x"
    extra.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(p for p in sorted(_os.listdir(tmp))
                if p.endswith(".parquet"))
    _os.replace(_os.path.join(tmp, part), _os.path.join(d, "b.parquet"))
    _sh.rmtree(tmp)

    rc, out = _run(capsys, "build", d, "--columns", "v",
                   "--catalog", db)
    assert rc == 0
    rc, out = _run(capsys, "optimize", d, "--columns", "v",
                   "--catalog", db)
    assert rc == 0 and out.startswith("packed 1 bins; 1 files"), out
    rc, out = _run(capsys, "sql", d, "--columns", "v",
                   "SELECT COUNT(*) AS n FROM self", "--catalog", db)
    assert rc == 0 and "|120" in out.replace("| 120", "|120"), out
    rc, _ = _run(capsys, "optimize", d, "--columns", "v")
    assert rc == 2


def test_cli_status(spark, corpus_dir, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    d, _ = corpus_dir
    db = str(tmp_path / "cli_status.db")
    rc, _ = _run(capsys, "build", d, "--columns", "v", "--catalog", db)
    assert rc == 0
    rc, _ = _run(capsys, "delete", d, "--columns", "v",
                 "v < 4", "--catalog", db)
    assert rc == 0
    rc, out = _run(capsys, "status", d, "--columns", "v",
                   "--catalog", db)
    assert rc == 0
    import json
    rep = json.loads(out)
    assert rep["files"] == 1 and rep["dv_files"] == 1
    assert rep["dv_deleted_rows"] == 2           # v in {0, 2}
    assert rep["needs_compact"] == ["a.parquet"]
    assert rep["small_files"] == 1
