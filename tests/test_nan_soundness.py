"""Float NaN semantics through the external index.

Parquet writers EXCLUDE NaN from float column-chunk min/max (a chunk
[1.0, NaN] records min = max = 1.0 with null_count 0 — pinned below),
while Spark's SQL layer orders NaN ABOVE every other value.  Vanilla
Spark is therefore internally split on NaN: its own parquet reader
zone-skips a [7.0, NaN] row group for ``> 7`` or ``!= 7`` (the NaN row
silently drops), yet any group it does read honors ``NaN > v`` as TRUE.
DuckDB's reader behaves the same way for range predicates (and engines
genuinely DISAGREE with each other on != / = / <= over NaN data).

This engine's contract, pinned here: **exact parity with a vanilla
Spark read of the same files, in every scan mode.**  Concretely:

- col-literal refutation is NOT NaN-guarded — it mirrors precisely the
  zone-map skipping Spark's own reader applies to pushed filters, so
  index pruning never changes the answer vanilla Spark would give;
- everything the index proves BEYOND what Spark's reader could do —
  col-col pruning, satisfaction proofs (COUNT/SUM/MIN/MAX pushdown),
  catalog-only answers — IS NaN-guarded, because vanilla execution
  would read those groups and honor NaN there.  The opt-in
  ``nan_count_columns`` page scan records per-row-group NaN counts;
  a recorded 0 re-arms those proofs, unknown degrades conservatively.
"""

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.df_catalog import (
    DataFrameIndexCatalog,
)
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)

NAN = float("nan")


@pytest.fixture(scope="module")
def nan_dir(tmp_path_factory):
    """Three files x 3-row row groups; f2's second row group hides a
    NaN behind clean-looking stats (min=210, max=212, null_count=0)."""
    d = tmp_path_factory.mktemp("nan_corpus")
    data = {
        "f1.parquet": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        "f2.parquet": [200.0, 201.0, 202.0, 210.0, NAN, 212.0],
        "f3.parquet": [900.0, 901.0, 902.0, 903.0, 904.0, 905.0],
    }
    for name, vals in data.items():
        t = pa.table({
            "id": pa.array(range(len(vals)), type=pa.int64()),
            "val": pa.array(vals, type=pa.float64()),
        })
        pq.write_table(t, str(d / name), row_group_size=3)
    return str(d)


def _vanilla(spark, nan_dir, pred_col):
    return spark.read.parquet(nan_dir).filter(pred_col).count()


def test_writer_excludes_nan_from_stats(nan_dir):
    """The premise: the NaN row group's footer stats look clean."""
    st = (pq.ParquetFile(os.path.join(nan_dir, "f2.parquet"))
          .metadata.row_group(1).column(1).statistics)
    assert st.has_min_max and not math.isnan(st.max)
    assert st.null_count == 0


def test_float_gt_matches_vanilla_spark(spark, nan_dir):
    """> 500: vanilla Spark's reader zone-skips the NaN group (max=212),
    losing the NaN row; index refutation reproduces that exactly, so
    both scan modes agree with the vanilla answer."""
    t = IndexedParquetTable(spark, nan_dir, index_columns=["val"])
    got = t.query(col("val") > 500.0).count()
    assert got == _vanilla(spark, nan_dir, F.col("val") > 500.0) == 6
    assert set(t.last_scan.file_names) == {"f3.parquet"}


def test_float_gt_boundary_group_honors_nan(spark, nan_dir):
    """> 211: the NaN group survives refutation (max=212 > 211), is
    read, and its NaN row satisfies at the SQL layer — parity again."""
    t = IndexedParquetTable(spark, nan_dir, index_columns=["val"])
    got = t.query(col("val") > 211.0).count()
    assert got == _vanilla(spark, nan_dir, F.col("val") > 211.0) == 8
    scanned = {(f, rg) for f, rgs in t.last_scan.files_scanned.items()
               for rg in rgs}
    assert ("f2.parquet", 1) in scanned


def test_float_ne_matches_vanilla_spark(spark, tmp_path):
    """!= on a single-valued group: vanilla Spark zone-skips when
    min = max = v, dropping the hidden NaN; the index refutes the same
    groups. (DuckDB would return the NaN row here — engines genuinely
    disagree on NaN data; this engine's contract is Spark parity.)"""
    d = tmp_path / "ne_corpus"
    d.mkdir()
    pq.write_table(pa.table({"val": pa.array([7.0, 7.0, 7.0])}),
                   str(d / "const.parquet"), row_group_size=3)
    pq.write_table(pa.table({"val": pa.array([7.0, NAN, 7.0])}),
                   str(d / "constnan.parquet"), row_group_size=3)
    t = IndexedParquetTable(spark, str(d), index_columns=["val"])
    got = t.query(col("val") != 7.0).count()
    assert got == _vanilla(spark, str(d), F.col("val") != 7.0) == 0
    assert t.last_scan.files_scanned == {}


def test_float_lt_prunes(spark, nan_dir):
    """< / <= / = refutation is NaN-safe at every layer (NaN never
    satisfies them), so pruning needs no guard at all."""
    t = IndexedParquetTable(spark, nan_dir, index_columns=["val"])
    got = t.query(col("val") < 10.0).count()
    assert got == _vanilla(spark, nan_dir, F.col("val") < 10.0) == 6
    assert set(t.last_scan.file_names) == {"f1.parquet"}


def test_count_pushdown_never_overcounts_nan(spark, nan_dir):
    """Satisfaction for float <= may only fire on groups PROVEN
    NaN-free: the f2 boundary group's hidden NaN fails <= 212 at the
    SQL layer, so claiming the group 'fully satisfying' from its
    NaN-blind stats would overcount vs a vanilla scan."""
    expect = _vanilla(spark, nan_dir, F.col("val") <= 212.0)
    assert expect == 11  # 6 + 3 + {210.0, 212.0}; NaN excluded

    t = IndexedParquetTable(spark, nan_dir, index_columns=["val"],
                            nan_count_columns=["val"])
    pred = col("val") <= 212.0
    assert t.count_rows(pred) == expect
    # NaN-free groups ARE proven full; only the NaN group boundary-scans
    assert t.last_count_pushdown["full_row_groups"] == 3
    assert t.last_count_pushdown["partial_row_groups"] == 1

    t2 = IndexedParquetTable(spark, nan_dir, index_columns=["val"])
    assert t2.count_rows(pred) == expect
    # without recorded counts no float group can be proven full
    assert t2.last_count_pushdown["full_row_groups"] == 0


def test_count_pushdown_gt_proofs_stay_armed(spark, nan_dir):
    """Satisfaction for > / >= / != needs NO NaN proof — a hidden NaN
    satisfies those predicates anyway, so min-based proofs hold even
    with counts unrecorded."""
    t = IndexedParquetTable(spark, nan_dir, index_columns=["val"])
    pred = col("val") >= 200.0
    got = t.count_rows(pred)
    assert got == _vanilla(spark, nan_dir, F.col("val") >= 200.0) == 12
    assert t.last_count_pushdown["full_row_groups"] == 4


def test_min_max_with_nan_falls_back_to_scan(spark, nan_dir):
    """Catalog bounds exclude the NaN; the answer must not. Spark's
    F.max returns NaN as the maximum, and min_max must agree."""
    t = IndexedParquetTable(spark, nan_dir, index_columns=["val"],
                            nan_count_columns=["val"])
    mn, mx = t.min_max("val")
    assert mn == 1.0
    assert math.isnan(mx)


def test_min_max_nan_free_catalog_only(spark, tmp_path):
    """With NaN counts recorded and zero, float bounds ARE trusted."""
    d = tmp_path / "clean"
    d.mkdir()
    pq.write_table(pa.table({"val": pa.array([1.5, 2.5, 9.5])}),
                   str(d / "a.parquet"), row_group_size=3)
    t = IndexedParquetTable(spark, str(d), index_columns=["val"],
                            nan_count_columns=["val"])
    assert t._column_nan_free("val")
    assert t.min_max("val") == (1.5, 9.5)


def test_min_max_unknown_nan_distrusts_float_bounds(spark, tmp_path):
    """Footer-only build (no page scan): float bounds are NOT trusted
    as attained values, so min_max scans — and still answers right."""
    d = tmp_path / "unknown"
    d.mkdir()
    pq.write_table(pa.table({"val": pa.array([1.5, 2.5, 9.5])}),
                   str(d / "a.parquet"), row_group_size=3)
    t = IndexedParquetTable(spark, str(d), index_columns=["val"])
    assert not t._column_nan_free("val")
    assert t.min_max("val") == (1.5, 9.5)


def test_backends_agree_on_float_pruning(spark, nan_dir):
    """SQLite SQL rendering and DataFrame Column evaluation must return
    the identical decision for the NaN-aware float rewrites."""
    t_sql = IndexedParquetTable(spark, nan_dir, index_columns=["val"],
                                nan_count_columns=["val"])
    t_df = IndexedParquetTable(spark, nan_dir, index_columns=["val"],
                               nan_count_columns=["val"],
                               catalog=DataFrameIndexCatalog(spark))
    for pred in (col("val") > 500.0, col("val") >= 210.0,
                 col("val") != 7.0, col("val") <= 3.0):
        a = t_sql.plan_scan(pred).files_scanned
        b = t_df.plan_scan(pred).files_scanned
        assert a == b, str(pred)


def test_colcol_float_nan_guard(spark, tmp_path):
    """a < b over floats: Spark never pushes col-col filters to its
    reader, so vanilla execution reads every group and 10.0 < NaN is
    TRUE. Col-col refutation from NaN-blind stats would lose that row —
    it must keep any group not PROVEN NaN-free, and with counts
    recorded the genuinely NaN-free file still prunes."""
    d = tmp_path / "colcol"
    d.mkdir()
    # b_max < a_min everywhere: classically refutable, but b has a NaN
    pq.write_table(pa.table({
        "a": pa.array([10.0, 11.0, 12.0]),
        "b": pa.array([1.0, NAN, 2.0]),
    }), str(d / "x.parquet"), row_group_size=3)
    pq.write_table(pa.table({
        "a": pa.array([10.0, 11.0, 12.0]),
        "b": pa.array([1.0, 1.5, 2.0]),
    }), str(d / "y.parquet"), row_group_size=3)

    t = IndexedParquetTable(spark, str(d), index_columns=["a", "b"],
                            nan_count_columns=["a", "b"])
    got = t.query(col("a") < col("b")).count()
    expect = (spark.read.parquet(str(d))
              .filter(F.col("a") < F.col("b")).count())
    assert got == expect == 1  # 10.0 < NaN only
    assert set(t.last_scan.file_names) == {"x.parquet"}, (
        "y.parquet is NaN-free and classically refuted")


def test_colcol_float_conservative_without_counts(spark, tmp_path):
    """Same corpus, footer-only build: neither file can be proven
    NaN-free, so col-col keeps both — and the answer still matches."""
    d = tmp_path / "colcol2"
    d.mkdir()
    pq.write_table(pa.table({
        "a": pa.array([10.0, 11.0, 12.0]),
        "b": pa.array([1.0, NAN, 2.0]),
    }), str(d / "x.parquet"), row_group_size=3)
    t = IndexedParquetTable(spark, str(d), index_columns=["a", "b"])
    got = t.query(col("a") < col("b")).count()
    assert got == 1
    assert set(t.last_scan.file_names) == {"x.parquet"}
