"""Cross-process writer lease (VERDICT r12 ask #3): two PROCESSES
DML-ing one catalog can no longer interleave their [CAS .. mutation]
phases.

- sqlite backend: OS advisory flock(2) on ``<db_path>.writer.lock``,
  kernel-released on holder death;
- DB-API backend: a lease ROW claimed by an atomic conditional
  UPDATE, with expiry (crashed-holder recovery) and a monotonically
  increasing fencing token.

The interleave test is the pinned ordering: each worker process
appends 'X-start' then (after a hold window) 'X-end' to a shared
events log while holding ``mutation_lease()``. With the lease
working, starts and ends PAIR UP — no other process's marker lands
between one process's start and end. Without the cross-process
lease, the sleep guarantees interleaving (that is exactly the
pre-fix failure shape).
"""

import multiprocessing as mp
import os
import sqlite3
import time

import pytest

from datafusion_async_parquet_index_spark.sources.catalog import (
    DBAPIIndexCatalog,
    SqliteIndexCatalog,
)


def _events_log(path, line):
    # O_APPEND single write: atomic at this size on POSIX
    with open(path, "a") as fh:
        fh.write(line + "\n")
        fh.flush()
        os.fsync(fh.fileno())


def _worker_sqlite(db, log, name, hold_s, start_barrier):
    cat = SqliteIndexCatalog(db)
    start_barrier.wait()
    with cat.mutation_lease():
        _events_log(log, f"{name}-start")
        time.sleep(hold_s)
        _events_log(log, f"{name}-end")


def _worker_dbapi(db, log, name, hold_s, start_barrier):
    cat = DBAPIIndexCatalog(
        connect=lambda: sqlite3.connect(db, timeout=30.0))
    start_barrier.wait()
    with cat.mutation_lease():
        _events_log(log, f"{name}-start")
        time.sleep(hold_s)
        _events_log(log, f"{name}-end")


def _assert_no_interleave(log, n_workers):
    with open(log) as fh:
        events = [ln.strip() for ln in fh if ln.strip()]
    assert len(events) == 2 * n_workers, events
    for i in range(0, len(events), 2):
        s, e = events[i], events[i + 1]
        assert s.endswith("-start") and e.endswith("-end"), events
        assert s.split("-")[0] == e.split("-")[0], \
            f"interleaved mutation phases: {events}"


@pytest.mark.parametrize("worker", [_worker_sqlite, _worker_dbapi],
                         ids=["sqlite-flock", "dbapi-lease-row"])
def test_two_process_mutation_phases_serialize(tmp_path, worker):
    db = str(tmp_path / "cat.db")
    # pre-create the database file so both processes open the same one
    sqlite3.connect(db).close()
    log = str(tmp_path / "events.log")
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(3)
    ps = [ctx.Process(target=worker,
                      args=(db, log, name, 0.25, barrier))
          for name in ("A", "B", "C")]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=120)
        assert p.exitcode == 0
    _assert_no_interleave(log, 3)


def test_flock_released_on_process_death(tmp_path):
    """A holder that dies without releasing must NOT lock out the
    next writer (kernel releases flocks on process exit)."""
    db = str(tmp_path / "cat.db")
    sqlite3.connect(db).close()
    ctx = mp.get_context("spawn")

    p = ctx.Process(target=_hold_and_die, args=(db,))
    p.start()
    p.join(timeout=60)
    assert p.exitcode == 0
    cat = SqliteIndexCatalog(db)
    t0 = time.monotonic()
    with cat.mutation_lease():
        pass
    assert time.monotonic() - t0 < 5.0


def _hold_and_die(db):
    cat = SqliteIndexCatalog(db)
    cat._acquire_process_lease()      # acquire and never release
    # process exit releases the flock


def test_dbapi_lease_expiry_recovers_crashed_holder(tmp_path):
    """A crashed DB-API holder's lease row is stealable after the
    TTL; the fencing token keeps increasing across acquisitions."""
    db = str(tmp_path / "cat.db")
    cat1 = DBAPIIndexCatalog(connect=lambda: sqlite3.connect(db))
    cat1._acquire_process_lease()      # "crash": never released
    f1 = cat1.lease_fence

    cat2 = DBAPIIndexCatalog(connect=lambda: sqlite3.connect(db))
    cat2.LEASE_TIMEOUT_S = 2.0
    # not expired yet -> times out with a NAMED error
    with pytest.raises(TimeoutError, match="writer lease"):
        cat2._acquire_process_lease()
    # expire the row (simulate TTL elapsed) -> steal succeeds
    with cat1._txn():
        cat1._exec("UPDATE writer_lease SET expires_at_ns = 1 "
                   "WHERE id = 1")
    cat2._acquire_process_lease()
    assert cat2.lease_fence > f1
    cat2._release_process_lease()


def test_reentrant_verbs_keep_the_file_lock(tmp_path):
    """A verb nesting another verb (merge's delete half) must not
    drop the cross-process lock at the inner exit: a second process
    trying to acquire DURING the outer hold still blocks."""
    db = str(tmp_path / "cat.db")
    sqlite3.connect(db).close()
    cat = SqliteIndexCatalog(db)
    ctx = mp.get_context("spawn")
    log = str(tmp_path / "events.log")
    with cat.mutation_lease():
        with cat.mutation_lease():     # reentrant inner verb
            pass                       # inner exit: depth 2 -> 1
        # cross-process lock must STILL be held here
        barrier = ctx.Barrier(1)
        p = ctx.Process(target=_worker_sqlite,
                        args=(db, log, "B", 0.0, barrier))
        p.start()
        time.sleep(1.0)
        assert p.is_alive(), \
            "second process acquired during outer hold"
        _events_log(log, "A-mutating")
    p.join(timeout=60)
    assert p.exitcode == 0
    with open(log) as fh:
        events = [ln.strip() for ln in fh]
    assert events == ["A-mutating", "B-start", "B-end"]
