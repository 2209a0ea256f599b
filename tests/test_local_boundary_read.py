"""Direct coverage for the driver-side bounded boundary read
(_read_rowgroups_local) — the hottest pushdown path's fast lane
(VERDICT r8 ask #4): (a) it ENGAGES for an under-cap boundary scan,
(b) cap-exceed demotes to the distributed reader with identical
results, (c) deletion-vector parity between the local path and the
Python DataSource on the same boundary set."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)


from fixture_io import one_file as _one_file_impl


def _one_file(df, d, name, block=8192):
    _one_file_impl(df, d, name, block=block)


@pytest.fixture()
def boundary_table(spark, tmp_path):
    """One sorted file, many small row groups: a mid-row-group range
    predicate always produces boundary (partial) groups."""
    d = str(tmp_path / "boundary")
    os.makedirs(d)
    base = spark.range(4_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 3).cast("long").alias("v"))
    _one_file(base.orderBy("k"), d, "data.parquet")
    t = IndexedParquetTable(spark, d, ["k"], sum_columns=["v"])
    # needs several row groups for a genuine boundary
    assert t.catalog.all_files()[0][2] > 3
    return t, base


def test_fast_path_engages_under_cap(boundary_table):
    t, base = boundary_table
    # mid-row-group cut: candidates exist, not all proven-full
    n = t.count_rows(col("k") >= 1_234)
    assert n == 4_000 - 1_234
    assert t.last_count_pushdown["partial_row_groups"] > 0
    assert getattr(t, "last_local_read", None) is not None
    assert t.last_local_read == {"engaged": True, "demoted": None}


def test_cap_exceed_falls_back_identically(boundary_table):
    t, base = boundary_table
    want = t.count_rows(col("k") >= 1_234)
    t.last_local_read = None
    t.ROWGROUP_LOCAL_MAX_BYTES = 1      # instance override: force demote
    got = t.count_rows(col("k") >= 1_234)
    assert got == want == 4_000 - 1_234
    assert t.last_local_read["engaged"] is False
    assert t.last_local_read["demoted"].startswith("cap:")
    # SUM boundary scan takes the same fallback and stays exact
    s, nn = t.sum_rows("v")
    assert (s, nn) == (sum(3 * k for k in range(4_000)), 4_000)


def test_dv_parity_local_vs_datasource(boundary_table):
    """Same boundary set, same DVs: the local pyarrow read (positional
    anti-filter) and the distributed Python DataSource must agree."""
    t, base = boundary_table
    ndel = t.delete_where((col("k") % 10) == 7)
    assert ndel == 400
    pred = col("k") >= 1_234
    live = {k for k in range(1_234, 4_000) if k % 10 != 7}
    n_local = t.count_rows(pred)
    assert t.last_local_read == {"engaged": True, "demoted": None}
    assert n_local == len(live)
    t.ROWGROUP_LOCAL_MAX_BYTES = 1      # force the DataSource path
    n_dist = t.count_rows(pred)
    assert n_dist == n_local
    assert t.last_local_read["engaged"] is False
    del t.ROWGROUP_LOCAL_MAX_BYTES      # back to the class default
    # row-level parity, not just counts: exact reads agree too
    got = sorted(r["k"] for r in
                 t.query(pred, mode="rowgroups").collect())
    assert got == sorted(live)


def test_genuine_driver_bug_raises_not_demotes(boundary_table,
                                               monkeypatch):
    """ADVICE r9: createDataFrame's TypeError/ValueError can mean a
    GENUINE driver bug (schema/column mismatch), not an Arrow
    conversion gap — those must surface, not hide behind the perf
    fallback."""
    t, _ = boundary_table

    def boom(*a, **kw):
        raise ValueError("Length mismatch: Expected axis has 2 "
                         "elements, new values have 3 elements")
    monkeypatch.setattr(t.spark, "createDataFrame", boom)
    with pytest.raises(ValueError, match="Length mismatch"):
        t.count_rows(col("k") >= 1_990)


def test_conversion_gap_still_demotes(boundary_table, monkeypatch):
    """The known Arrow→Spark gap class keeps the documented demotion:
    logged, recorded in last_local_read, distributed fallback."""
    t, base = boundary_table

    real = t.spark.createDataFrame

    def gap(*a, **kw):
        raise TypeError("type map<string,int> is not supported")
    monkeypatch.setattr(t.spark, "createDataFrame", gap)
    n = t.count_rows(col("k") >= 1_990)
    monkeypatch.setattr(t.spark, "createDataFrame", real)
    assert n == base.filter(F.col("k") >= 1_990).count()
    assert t.last_local_read["engaged"] is False
    assert "conversion" in t.last_local_read["demoted"]


def test_arrow_typeerror_subclass_demotes(boundary_table, monkeypatch):
    """pyarrow raises ArrowTypeError (a TypeError subclass) for
    arrow-side conversion gaps with messages like 'Expected bytes,
    got ...' that match no keyword — the isinstance check on the
    Arrow base class must still demote gracefully (review r10)."""
    import pyarrow as pa

    t, base = boundary_table
    real = t.spark.createDataFrame

    def gap(*a, **kw):
        raise pa.lib.ArrowTypeError("Expected bytes, got a 'int' object")
    monkeypatch.setattr(t.spark, "createDataFrame", gap)
    n = t.count_rows(col("k") >= 1_990)
    monkeypatch.setattr(t.spark, "createDataFrame", real)
    assert n == base.filter(F.col("k") >= 1_990).count()
    assert t.last_local_read["demoted"].startswith("conversion")
