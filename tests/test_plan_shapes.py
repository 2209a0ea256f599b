"""Physical-plan regression guards: the plans the engine is designed
around must not silently degrade — pushed filters reach the Parquet
scan, small dimensions broadcast, the as-of join stays a single
shuffle. Substring matches keep this robust across Spark versions.
"""

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.queries import (
    q2_point_equality, q7_join_revenue_by_nation, q18_semi_join,
    q20_asof_join,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_point_equality_pushes_filter(spark, sf_dir):
    plan = _plan(q2_point_equality(spark, sf_dir))
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_join_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(q7_join_revenue_by_nation(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_join_is_semi(spark, sf_dir):
    plan = _plan(q18_semi_join(spark, sf_dir))
    assert "LeftSemi" in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    plan = _plan(q20_asof_join(spark, sf_dir))
    # one hash-partitioning exchange on user_id for the window; no join
    # operator at all (union + running last), so no second shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_indexed_scan_location_is_pruned(spark, demo_dir):
    from datafusion_async_parquet_index_spark.plans.expr import col
    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )
    t = IndexedParquetTable(spark, demo_dir, ["value", "text"])
    df = t.query(col("value") == 150)
    plan = _plan(df)
    assert "file2.parquet" in plan
    assert "file1.parquet" not in plan and "file3.parquet" not in plan


def test_hive_partition_pruning(spark, sf_dir, tmp_path):
    """Partitioned layouts prune directories at planning time — the
    built-in complement to the external row-group index."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_part")
    orders.write.partitionBy("o_orderpriority").parquet(path)
    df = spark.read.parquet(path).filter(
        F.col("o_orderpriority") == "1-URGENT")
    plan = _plan(df)
    assert "PartitionFilters" in plan and "1-URGENT" in plan
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert df.count() == want


def test_minhash_pipeline_stays_jvm_side(spark, sf_dir):
    """The dedup hot path must never degrade to a cartesian product or
    row-at-a-time Python evaluation — its scale story is band equi-join
    + JVM expressions, plus the one batched Arrow hashing kernel
    (dedup._hashed_shingles, a mapInPandas — NOT BatchEvalPython)."""
    from datafusion_async_parquet_index_spark.operators.dedup import (
        dedup_minhash_lsh, dedup_simhash,
    )
    for q in (dedup_minhash_lsh, dedup_simhash):
        plan = _plan(q(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan  # no Python UDF in hot path


def test_embedding_lsh_no_cartesian(spark, sf_dir):
    """The embedding LSH near-dup plan must be equi-join-shaped
    throughout: no cartesian product, no broadcast nested loop — the
    exact failure mode the (table, key) banding exists to prevent."""
    from datafusion_async_parquet_index_spark.operators.dedup import (
        dedup_embedding_lsh,
    )
    plan = _plan(dedup_embedding_lsh(spark, str(sf_dir)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivfpq_no_cartesian_no_python(spark, sf_dir):
    """The IVFPQ composition must stay an equi-join on the probed cell
    (qc == cc) with pure-JVM integer ADC math — no cartesian product,
    no Python UDF anywhere in the plan."""
    from datafusion_async_parquet_index_spark.operators.similarity import (
        sim_ivfpq_topk,
    )
    plan = _plan(sim_ivfpq_topk(spark, str(sf_dir)))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_incremental_dedup_no_cartesian(spark, sf_dir):
    from datafusion_async_parquet_index_spark.operators.dedup import (
        dedup_incremental,
    )
    plan = _plan(dedup_incremental(spark, str(sf_dir)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_is_banded_not_nested_loop(spark, sf_dir):
    """The ±1-day interval join must plan as a hash equi-join on the
    manufactured day-bin key — never the nested-loop theta join the
    naive formulation produces."""
    from datafusion_async_parquet_index_spark.queries import q33_range_join

    plan = _plan(q33_range_join(spark, str(sf_dir)))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cube_is_single_aggregate_with_expand(spark, sf_dir):
    """CUBE must plan as Expand + hash aggregate — one shuffle for all
    grouping sets, not one aggregate per set."""
    from datafusion_async_parquet_index_spark.queries import q34_cube

    plan = _plan(q34_cube(spark, str(sf_dir)))
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # partial+final


def test_sequence_pack_single_source_exchange(spark, sf_dir):
    """Sequence packing is one window over source partitions plus one
    aggregation — no join, no extra shuffle stages."""
    from datafusion_async_parquet_index_spark.operators.text import (
        text_sequence_pack,
    )
    plan = _plan(text_sequence_pack(spark, str(sf_dir)))
    assert "Join" not in plan
    assert "Window" in plan


def test_rowgroups_mode_splits_native_vs_python(spark, demo_dir):
    """mode="rowgroups" pays the Python DataSource tax only for files
    where the access plan actually skips row groups; fully-covered
    files must read through the native vectorized reader."""
    from datafusion_async_parquet_index_spark.plans.expr import col
    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )
    t = IndexedParquetTable(spark, demo_dir, ["value"])
    # no predicate: every row group of every file survives -> pure
    # native scan, no Python data source anywhere in the plan
    full = t.query(None, mode="rowgroups")
    plan = _plan(full)
    assert "rowgroup_parquet" not in plan and "PythonScan" not in plan
    assert full.count() == t.query(None).count()
    # partial plan: rg-skipping predicate -> the Python exact reader
    # carries the partial file, and row-group exactness is preserved
    part = t.query(col("value") == 150, mode="rowgroups")
    assert t.last_scan.files_scanned == {"file2.parquet": [1]}
    plan = _plan(part)
    assert "rowgroup_parquet" in plan or "PythonScan" in plan
    assert [r.value for r in part.collect()] == [150]


def test_exists_plans_as_semi_and_anti(spark, sf_dir):
    """EXISTS/NOT EXISTS must decorrelate to one semi and one anti hash
    join — never a per-row subquery or nested loop."""
    from datafusion_async_parquet_index_spark.queries import (
        q38_exists_subquery,
    )
    plan = _plan(q38_exists_subquery(spark, str(sf_dir)))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_grouping_sets_single_expand(spark, sf_dir):
    """Explicit GROUPING SETS shares CUBE's plan shape: one Expand, one
    aggregate pipeline — not one scan per set."""
    from datafusion_async_parquet_index_spark.queries import (
        q39_grouping_sets,
    )
    plan = _plan(q39_grouping_sets(spark, str(sf_dir)))
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # partial+final


def test_pivot_is_one_aggregate(spark, sf_dir):
    """PIVOT desugars to conditional aggregation: no join, at most the
    partial+final aggregate exchanges."""
    from datafusion_async_parquet_index_spark.queries import q41_pivot

    plan = _plan(q41_pivot(spark, str(sf_dir)))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_substring_ngram_no_cartesian(spark, sf_dir):
    """The n-gram coverage plan is explode + groupBy + equi-join on the
    gram hash — never a pairwise document comparison."""
    from datafusion_async_parquet_index_spark.operators.curation import (
        dedup_substring_ngram,
    )
    plan = _plan(dedup_substring_ngram(spark, str(sf_dir)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_interval_join_is_banded(spark, sf_dir):
    """The ±60s interval join must be a hash equi-join on the
    (user, minute-bin) key, not a theta nested loop."""
    from datafusion_async_parquet_index_spark.operators.events import (
        ev_interval_join,
    )
    plan = _plan(ev_interval_join(spark, str(sf_dir)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_is_map_only(spark, sf_dir):
    """Winnowing must stay shuffle-free: fingerprint selection is pure
    array expressions over the scan (the repartition fixup for tiny
    local inputs is a round-robin exchange, not a hash shuffle)."""
    from datafusion_async_parquet_index_spark.operators.curation import (
        text_winnow_fingerprint,
    )
    plan = _plan(text_winnow_fingerprint(spark, str(sf_dir)))
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan and "Window" not in plan


def test_contamination_no_cartesian(spark, sf_dir):
    """Decontamination is a distinct-gram build + benchmark-sized probe
    — never a document x document comparison."""
    from datafusion_async_parquet_index_spark.operators.curation import (
        dedup_contamination,
    )
    plan = _plan(dedup_contamination(spark, str(sf_dir)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_repetition_stats_map_only(spark, sf_dir):
    from datafusion_async_parquet_index_spark.operators.curation import (
        text_repetition_stats,
    )
    plan = _plan(text_repetition_stats(spark, str(sf_dir)))
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_attribution_is_banded_not_theta(spark, sf_dir):
    """Last-touch attribution joins purchases to touches via the bin
    equi-join (2 bins per purchase) — no per-user quadratic theta join,
    no per-row Python, and exactly one row_number window."""
    from datafusion_async_parquet_index_spark.operators.events import (
        ev_attribution,
    )
    plan = _plan(ev_attribution(spark, str(sf_dir)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("RunningWindowFunction") <= 1


def test_bigram_logprob_no_window(spark, sf_dir):
    """Bigrams are built inside the token array (transform over index
    positions) — no posexplode + lag window; the only exchanges are the
    count aggregations and their joins back."""
    from datafusion_async_parquet_index_spark.operators.text import (
        text_bigram_logprob,
    )
    plan = _plan(text_bigram_logprob(spark, str(sf_dir)))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_binned_quantiles_state_is_bounded(spark, sf_dir):
    """The histogram-quantile sketch reduces the data to ~#bins rows
    before any window: the single-partition cumulative window must sit
    on the aggregated bin table, never on raw rows (a global sort of
    the data would show as a rangepartitioning exchange feeding a sort
    of the full input)."""
    from datafusion_async_parquet_index_spark.queries import (
        q45_binned_quantiles,
    )
    plan = _plan(q45_binned_quantiles(spark, str(sf_dir)))
    assert "HashAggregate" in plan           # bin counts first
    assert "BatchEvalPython" not in plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed by the join key into the same bucket count:
    the sort-merge join must read bucket i against bucket i with NO
    shuffle on either side — the co-located-join contract."""
    from datafusion_async_parquet_index_spark.queries import (
        _bucketed_orders_customer,
    )

    on, cn = _bucketed_orders_customer(spark, sf_dir)
    o, c = spark.table(on), spark.table(cn)
    j = o.hint("merge").join(c, o.o_custkey == c.c_custkey)
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan


def test_pq_topk_no_cartesian_and_broadcast(spark, sf_dir):
    """The PQ pair join must be a broadcast of the tiny query side —
    never a cartesian product — and the codebook must be folded into
    literals (no extra join against a codebook table)."""
    from datafusion_async_parquet_index_spark.operators.similarity import (
        sim_pq_topk,
    )

    plan = _plan(sim_pq_topk(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_rank_family_single_window_exchange(spark, sf_dir):
    """All four ranking functions must ride ONE window pass over one
    hash exchange on the partition key — never a pass per function."""
    from datafusion_async_parquet_index_spark.queries import q57_rank_family

    plan = _plan(q57_rank_family(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") <= 2, plan  # one Window op (+AQE reuse)


def test_unpivot_is_expand_no_extra_shuffle(spark, sf_dir):
    """UNPIVOT plans as an Expand over the aggregated wide form; the
    only exchanges are the pivot aggregate's partial/final pair."""
    from datafusion_async_parquet_index_spark.queries import q58_unpivot

    plan = _plan(q58_unpivot(spark, sf_dir))
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_semantic_dedup_grouped_matmul_no_cartesian(spark, sf_dir):
    """The within-cluster pair work must never plan as a cartesian /
    nested-loop pair join.  On a low-collapse corpus (this one) it
    runs as ONE per-cluster blocked matmul — a FlatMapGroupsInPandas
    keyed by the cluster id, no pair frame, no window — the round-14
    replacement for the salted pair join (value parity with the old
    expression is pinned in tests/test_semantic_matmul_parity.py)."""
    from datafusion_async_parquet_index_spark.operators.dedup import (
        dedup_semantic,
    )
    plan = _plan(dedup_semantic(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "_cluster_dups" in plan  # the per-cluster matmul stage


def test_hybrid_rrf_broadcasts_query_side(spark, sf_dir):
    """The lexical probe must broadcast the tiny weighted query-terms
    side against the corpus terms (map-side inverted-index join) — the
    big side never shuffles before the aggregate — and the whole plan
    stays cartesian-free."""
    from datafusion_async_parquet_index_spark.operators.similarity import (
        sim_hybrid_rrf,
    )
    plan = _plan(sim_hybrid_rrf(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_dict_pruning_scan_location_excludes_refuted_file(spark, sf_dir):
    """q82's equality scan must not even LIST file a (value-set
    refuted) in the Parquet scan location — the pruning is visible in
    the physical plan, not just the ScanDecision."""
    from datafusion_async_parquet_index_spark.plans.expr import col
    from datafusion_async_parquet_index_spark.queries import (
        _dict_split_orders,
    )
    t = _dict_split_orders(spark, sf_dir)
    df = t.query(col("o_orderstatus") == "O")
    plan = _plan(df)
    assert "b.parquet" in plan
    assert "a.parquet" not in plan


def test_dv_read_and_change_feed_plan_shapes(spark, tmp_path):
    """The DV read path must be a broadcast hash ANTI-join (one O(1)
    probe per row, never a per-row array scan), and the change feed's
    delete extraction a broadcast SEMI-join — both under the
    cumulative broadcast cap."""
    import os
    from pyspark.sql import functions as F
    from datafusion_async_parquet_index_spark.plans.expr import col
    from datafusion_async_parquet_index_spark.sources.table import (
        IndexedParquetTable,
    )
    d = str(tmp_path / "dvplan")
    os.makedirs(d)
    df = spark.range(2_000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v"))
    tmp = d + "_t"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(p for p in sorted(os.listdir(tmp))
                if p.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), os.path.join(d, "a.parquet"))
    import shutil
    shutil.rmtree(tmp)
    t = IndexedParquetTable(spark, d, ["k", "v"])
    s0 = t.snapshot()
    t.delete_where(col("v") < 5)
    s1 = t.snapshot()
    read_plan = _plan(t.query(None))
    assert "BroadcastExchange" in read_plan, read_plan
    assert "LeftAnti" in read_plan, read_plan
    assert "exists(" not in read_plan, "per-row array scan crept back"
    feed = t.read_changes(s0, s1)
    feed_plan = _plan(feed)
    assert "LeftSemi" in feed_plan, feed_plan
    assert "BroadcastExchange" in feed_plan, feed_plan
