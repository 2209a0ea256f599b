"""Behavioral tests for the pipeline operators on constructed data —
near-dups must be found, non-dups must not, multimodal plumbing must
carry real batches. (The oracle harness checks engine-vs-DuckDB parity;
these check the semantics are the intended ones.)
"""

import pytest
from pyspark.sql import functions as F

from datafusion_async_parquet_index_spark.operators.dedup import (
    cosine_pairs, minhash_pairs, ngram_jaccard_pairs, simhash_signatures,
)
from datafusion_async_parquet_index_spark.operators.multimodal import (
    decode_image_stub, extract_features, frame_sample, synthesize_media,
)

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun light")
NEAR = BASE.replace("afternoon", "evening")
OTHER = ("completely different content about distributed query engines "
         "and columnar storage formats with vectorized execution kernels")


@pytest.fixture(scope="module")
def trio(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER)], ["doc_id", "text"])


def test_minhash_finds_near_dup_not_unrelated(trio):
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard for r in minhash_pairs(trio).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_ranks_near_dup_above_unrelated(trio):
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in ngram_jaccard_pairs(trio, threshold=0.0).collect()}
    assert pairs[(1, 2)] > 0.8
    assert pairs.get((1, 3), 0.0) < 0.2


def test_simhash_hamming_distance(trio):
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(trio).collect()}
    near = bin(sigs[1] ^ sigs[2]).count("1")
    far = bin(sigs[1] ^ sigs[3]).count("1")
    assert near < far
    assert near <= 12  # one-word change flips few bits of 60


def test_cosine_pairs_identical_and_orthogonal(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0]),
         (4, [0.9999, 0.01, 0.0])],
        ["vec_id", "embedding"])
    pairs = {(r.vec_a, r.vec_b): r.cosine for r in cosine_pairs(df, 0.95).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 4) in pairs
    assert (1, 3) not in pairs


def test_exact_dedup_keeps_min_id(spark, tmp_path):
    df = spark.createDataFrame(
        [(10, "same"), (7, "same"), (3, "unique")], ["doc_id", "text"])
    out = (df.groupBy(F.md5("text").alias("h"))
           .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("cnt")))
    rows = {r.keep: r.cnt for r in out.collect()}
    assert rows == {7: 2, 3: 1}


# -- multimodal -------------------------------------------------------------

def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"bytes", "image/png")


def test_decode_stub_deterministic():
    a = decode_image_stub(b"x" * 100, "video/mp4", fake_decode=True)
    b = decode_image_stub(b"x" * 100, "video/mp4", fake_decode=True)
    assert a == b
    assert a["n_frames"] > 1


def test_extract_features_mapinpandas(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    feats = extract_features(media)
    rows = feats.limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.byte_len > 0
        assert 16 <= r.width < 80 and 16 <= r.height < 80
        assert len(r.feature) == 8
        assert sum(r.feature) == min(r.byte_len, 256)


def test_frame_sample_counts(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    frames = frame_sample(media, every_n_bytes=100)
    got = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    lens = {r.doc_id: r.byte_len for r in media.collect()}
    for r in got:
        assert r.n == lens[r.doc_id] // 100 + 1
