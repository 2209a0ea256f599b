"""Bloom-filter index extension: equality pruning on high-cardinality
columns where min/max stats cannot help (the reference's own "indexing a
UUID by min/max would be pointless" case, main.rs:104-118).

Soundness contract under test: a Bloom filter may scan extra row groups
(false positives) but must NEVER skip a row group containing a matching
row — pruned scan + residual filter == full scan + filter, always.
"""

import hashlib
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_async_parquet_index_spark.plans.expr import col
from datafusion_async_parquet_index_spark.sources.bloom import (
    bloom_contains, bloom_params, build_bloom, canonical_bytes,
)
from datafusion_async_parquet_index_spark.sources.table import (
    IndexedParquetTable,
)


def _uuidish(i: int) -> str:
    return hashlib.md5(f"uuid|{i}".encode()).hexdigest()


@pytest.fixture(scope="module")
def uuid_corpus(tmp_path_factory):
    """4 files x 2 row groups x 250 rows of pseudo-UUID strings; every
    row group's min/max spans nearly the whole hex range, so min/max
    pruning is useless by construction."""
    d = tmp_path_factory.mktemp("uuid_corpus")
    n = 0
    for f in range(4):
        ids = list(range(n, n + 500))
        n += 500
        tbl = pa.table({
            "row_id": pa.array(ids, pa.int64()),
            "uid": pa.array([_uuidish(i) for i in ids], pa.string()),
        })
        pq.write_table(tbl, str(d / f"part-{f}.parquet"), row_group_size=250)
    return str(d)


def test_bloom_unit_roundtrip():
    vals = {canonical_bytes("string", _uuidish(i)) for i in range(1000)}
    m, k = bloom_params(len(vals), fpp=0.01)
    blob = build_bloom(vals, m, k)
    for v in list(vals)[:100]:
        assert bloom_contains(blob, m, k, v)  # no false negatives
    missing = sum(
        bloom_contains(blob, m, k, canonical_bytes("string", _uuidish(i)))
        for i in range(1000, 3000))
    assert missing < 2000 * 0.05  # fpp in the right ballpark


def test_bloom_prunes_where_minmax_cannot(spark, uuid_corpus):
    plain = IndexedParquetTable(spark, uuid_corpus, ["uid"])
    bloomed = IndexedParquetTable(spark, uuid_corpus, ["uid"],
                                  bloom_columns=["uid"])
    target = _uuidish(1234)  # lives in file 2, row group 0

    df = plain.query(col("uid") == target)
    assert df.count() == 1
    assert plain.last_scan.row_groups_scanned == 8  # min/max useless

    df = bloomed.query(col("uid") == target)
    assert df.count() == 1
    assert bloomed.last_scan.row_groups_scanned < 8
    assert bloomed.last_scan.bloom_skipped > 0
    assert "bloom filters skipped" in bloomed.last_scan.describe()
    # the row group that truly holds the value must survive
    assert any(0 in rgs and f == "part-2.parquet"
               for f, rgs in bloomed.last_scan.files_scanned.items())


def test_bloom_in_list_and_absent_value(spark, uuid_corpus):
    t = IndexedParquetTable(spark, uuid_corpus, ["uid"],
                            bloom_columns=["uid"])
    present = [_uuidish(10), _uuidish(1700)]
    absent = _uuidish(999_999)
    df = t.query(col("uid").isin(present + [absent]))
    assert df.count() == 2
    # a value present in no row group prunes to (almost) nothing
    df = t.query(col("uid") == absent)
    assert df.count() == 0
    assert t.last_scan.row_groups_scanned <= 1  # at most a false positive


def test_bloom_soundness_random_probes(spark, uuid_corpus):
    """pruned + residual == full scan + filter, for present and absent
    values alike, equality and IN, including mixed AND predicates."""
    t = IndexedParquetTable(spark, uuid_corpus, ["uid", "row_id"],
                            bloom_columns=["uid"])
    full = spark.read.parquet(uuid_corpus + "/*.parquet")
    rng = random.Random(7)
    probes = [_uuidish(rng.randrange(0, 2000)) for _ in range(8)] + \
             [_uuidish(rng.randrange(10_000, 20_000)) for _ in range(8)]
    for v in probes:
        got = t.query(col("uid") == v).count()
        want = full.filter(full.uid == v).count()
        assert got == want
    # mixed conjunct: bloom column + range on another column
    v = _uuidish(600)
    got = t.query((col("uid") == v) & (col("row_id") < 10_000)).count()
    want = full.filter((full.uid == v) & (full.row_id < 10_000)).count()
    assert got == want


def test_bloom_type_mismatch_literal_is_conservative(spark, uuid_corpus):
    """A cross-type literal must not refine (and must not crash in the
    planner): every candidate row group survives, exactness is left to
    the residual filter (which under ANSI mode may itself reject the
    malformed cast — engine semantics, not the index's concern)."""
    t = IndexedParquetTable(spark, uuid_corpus, ["uid"],
                            bloom_columns=["uid"])
    decision = t.plan_scan(col("uid") == 12345)
    assert decision.bloom_skipped == 0
    assert decision.row_groups_scanned == 8


def test_bloom_survives_refresh(spark, uuid_corpus, tmp_path):
    """refresh() rebuilds blooms for new files only; pruning keeps
    working across incremental maintenance."""
    import shutil
    d = str(tmp_path / "grow")
    shutil.copytree(uuid_corpus, d)
    t = IndexedParquetTable(spark, d, ["uid"], bloom_columns=["uid"])
    ids = list(range(5000, 5500))
    tbl = pa.table({
        "row_id": pa.array(ids, pa.int64()),
        "uid": pa.array([_uuidish(i) for i in ids], pa.string()),
    })
    pq.write_table(tbl, d + "/part-9.parquet", row_group_size=250)
    t.refresh()
    assert t.query(col("uid") == _uuidish(5250)).count() == 1
    assert t.last_scan.row_groups_scanned < 10


# -- token blooms: full-text word search ------------------------------------

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet"]


def _sentence(i: int) -> str:
    rng = random.Random(i)
    base = [WORDS[rng.randrange(4)] for _ in range(6)]
    # words 4..9 are rare: word w lives ONLY in row group (w-4) % 4
    # (row groups are 100 consecutive ids), ten rows each — so token
    # pruning has something real to skip
    for w in range(4, 10):
        if i // 100 == (w - 4) % 4 and i % 10 == 3:
            base.append(WORDS[w])
    return " ".join(base)


@pytest.fixture(scope="module")
def text_corpus(tmp_path_factory):
    """2 files x 2 row groups x 100 rows of synthetic sentences; the
    rare words land in known row groups so token pruning is checkable."""
    d = tmp_path_factory.mktemp("text_corpus")
    n = 0
    for f in range(2):
        ids = list(range(n, n + 200))
        n += 200
        tbl = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "body": pa.array([_sentence(i) for i in ids], pa.string()),
        })
        pq.write_table(tbl, str(d / f"part-{f}.parquet"), row_group_size=100)
    return str(d)


def test_token_bloom_absent_word_zero_io(spark, text_corpus):
    t = IndexedParquetTable(spark, text_corpus, ["doc_id"],
                            token_bloom_columns=["body"])
    df = t.query(col("body").contains_token("zanzibar"))
    assert df.count() == 0
    assert t.last_scan.files_scanned == {}


def test_token_bloom_prunes_to_containing_groups(spark, text_corpus):
    """Common words scan everything; each rare word scans at most the
    row groups that actually contain it (bloom FPs may add a group, but
    with ~10-token-vocabulary filters the 1% fpp makes that unlikely
    across all six words — assert no more than half the groups scan)."""
    t = IndexedParquetTable(spark, text_corpus, ["doc_id"],
                            token_bloom_columns=["body"])
    df = t.query(col("body").contains_token("alpha"))
    assert df.count() > 0  # common word: present

    total_hits = 0
    total_scanned = 0
    for w in WORDS[4:]:
        df = t.query(col("body").contains_token(w))
        expect = sum(1 for i in range(400) if w in _sentence(i).split())
        assert df.count() == expect, w
        total_hits += expect
        total_scanned += t.last_scan.row_groups_scanned
    assert total_scanned <= 2 * 6  # rare words: at most half the 4 rgs each


def test_token_bloom_soundness_combined_predicates(spark, text_corpus):
    """pruned scan + residual == full scan + filter, for token + range
    conjunctions and for every vocabulary word."""
    from pyspark.sql import functions as F

    t = IndexedParquetTable(spark, text_corpus, ["doc_id"],
                            token_bloom_columns=["body"])
    full = spark.read.parquet(text_corpus)
    from datafusion_async_parquet_index_spark.functions import tokens
    for w in WORDS + ["nothere"]:
        pred = col("body").contains_token(w) & (col("doc_id") >= 100)
        got = t.query(pred).count()
        expect = full.filter(
            F.array_contains(tokens(F.col("body")), w)
            & (F.col("doc_id") >= 100)).count()
        assert got == expect, w


def test_token_bloom_tokenizer_parity():
    """The Python build-side tokenizer must match functions.tokens /
    sql_tokens exactly — punctuation, case folding, empties."""
    from datafusion_async_parquet_index_spark.sources.stats import _py_tokens

    assert _py_tokens("Hello, World! x2") == ["hello", "world", "x2"]
    assert _py_tokens("--a..b--") == ["a", "b"]
    assert _py_tokens("") == []
    assert _py_tokens("...") == []


def test_token_bloom_negation_is_conservative(spark, text_corpus):
    """NOT contains_token must never bloom-prune (a filter can prove
    absence, not presence): the scan stays full and results match the
    exact complement."""
    from pyspark.sql import functions as F

    from datafusion_async_parquet_index_spark.functions import tokens
    from datafusion_async_parquet_index_spark.plans.expr import Not

    t = IndexedParquetTable(spark, text_corpus, ["doc_id"],
                            token_bloom_columns=["body"])
    total_rgs = sum(f[2] for f in t.catalog.all_files())
    got = t.query(Not(col("body").contains_token("alpha"))).count()
    assert t.last_scan.row_groups_scanned == total_rgs  # no false prune
    expect = (spark.read.parquet(text_corpus)
              .filter(~F.array_contains(tokens(F.col("body")), "alpha"))
              .count())
    assert got == expect


def test_token_bloom_maintained_by_streaming_ingest(spark, tmp_path):
    """The foreachBatch ingest sink's incremental refresh() rebuilds
    token blooms for new files only, so full-text pruning keeps working
    as micro-batches land."""
    from pyspark.sql import types as T

    from datafusion_async_parquet_index_spark.streaming import (
        indexed_ingest_sink,
    )

    d = tmp_path / "stream_tbl"
    d.mkdir()
    schema = T.StructType([
        T.StructField("doc_id", T.IntegerType()),
        T.StructField("body", T.StringType()),
    ])
    t = IndexedParquetTable(spark, str(d), ["doc_id"],
                            token_bloom_columns=["body"])
    sink = indexed_ingest_sink(t)
    sink(spark.createDataFrame(
        [(i, "alpha common words") for i in range(50)], schema), 1)
    sink(spark.createDataFrame(
        [(i, "omega appears late" if i == 75 else "alpha common words")
         for i in range(50, 100)], schema), 2)
    df = t.query(col("body").contains_token("omega"))
    assert df.count() == 1
    # only batch 2's file(s) can contain 'omega'
    assert all("b000002" in f for f in t.last_scan.file_names)
    assert t.query(col("body").contains_token("missingword")).count() == 0
    assert t.last_scan.files_scanned == {}
