"""Perceptual image dedup (round 11): ahash_bits quantizes decoded
pixels (grayscale -> GRID nearest-neighbor -> threshold at floor
mean), and mm_image_ahash_dedup groups the corpus by fingerprint
equality — the image-side dedup_exact."""

import numpy as np

from datafusion_async_parquet_index_spark.operators.multimodal import (
    AHASH_GRID,
    ahash_bits,
    mm_image_ahash_dedup,
)


def test_ahash_bits_manual():
    """4x4 grid over a 4x4 image is the identity sample: bits are a
    direct mean-threshold of the 16 gray values."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
    g = img.astype(np.int64).sum(axis=2) // 3
    mean = int(g.sum()) // g.size
    want = "".join("1" if v >= mean else "0"
                   for v in g.reshape(-1).tolist())
    assert ahash_bits(img) == want
    assert len(want) == AHASH_GRID * AHASH_GRID


def test_ahash_invariance_and_sensitivity():
    """Byte-identical images collide; flipping one sampled pixel by a
    wide margin flips the fingerprint."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
    assert ahash_bits(img) == ahash_bits(img.copy())
    other = img.copy()
    other[0, 0] = 255 - other[0, 0]
    # not guaranteed for every draw, but deterministic for this seed
    assert ahash_bits(other) != ahash_bits(img)


def test_groups_are_nontrivial_and_consistent(spark, sf_dir):
    """The corpus's shared near-dup prefixes produce non-empty
    fingerprint groups, every group has >= 2 members, and the group
    sizes sum to fewer docs than the corpus (it's a dedup signal,
    not a constant hash)."""
    rows = mm_image_ahash_dedup(spark, sf_dir).collect()
    assert rows, "expected non-empty perceptual groups"
    n_docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
              .count())
    grouped = sum(r["n_docs"] for r in rows)
    assert all(r["n_docs"] >= 2 for r in rows)
    assert grouped < n_docs
