"""Round-9 batch-2 operators: hamming_neardup_pairs (banded perceptual-hash
near-dup join) and hard_negatives (label-masked top-k mining) — hand-built
fixtures with known Hamming distances and a numpy cross-check."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# hamming_neardup_pairs


def _pairs(df):
    return {(r["id_a"], r["id_b"]): r["dist"] for r in df.collect()}


def test_hamming_neardup_exact_and_near(spark):
    from pangool_spark.operators.dedup import hamming_neardup_pairs

    # 64-bit hex hashes: 1↔2 identical (dist 0); 1↔3 differ in the last
    # nibble by one bit (dist 1); 4 differs from all in >7 bits.
    rows = [
        (1, "00000000000000f0"),
        (2, "00000000000000f0"),
        (3, "00000000000000f1"),
        (4, "ffffffffffffffff"),
    ]
    df = spark.createDataFrame(rows, ["media_id", "dhash"])
    got = _pairs(hamming_neardup_pairs(df, max_dist=7))
    assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1}


def test_hamming_neardup_pigeonhole_recall_boundary(spark):
    from pangool_spark.operators.dedup import hamming_neardup_pairs

    # Exactly max_dist=7 bits spread over 7 DIFFERENT bands: the 8th band
    # is identical, so the pair must still be found (the pigeonhole edge).
    a = "00" * 8
    b = "01" * 7 + "00"  # one flipped bit in each of the first 7 bands
    df = spark.createDataFrame([(1, a), (2, b)], ["media_id", "dhash"])
    got = _pairs(hamming_neardup_pairs(df, max_dist=7))
    assert got == {(1, 2): 7}
    # 8 flipped bits across all 8 bands share no band — correctly outside
    # the operator's contract (and the guard refuses max_dist=8 upfront).
    c = "01" * 8
    df2 = spark.createDataFrame([(1, a), (2, c)], ["media_id", "dhash"])
    assert _pairs(hamming_neardup_pairs(df2, max_dist=7)) == {}


def test_hamming_neardup_case_insensitive_hex(spark):
    from pangool_spark.operators.dedup import hamming_neardup_pairs

    df = spark.createDataFrame(
        [(1, "AB" * 8), (2, "ab" * 8)], ["media_id", "dhash"]
    )
    assert _pairs(hamming_neardup_pairs(df, max_dist=7)) == {(1, 2): 0}


def test_hamming_neardup_guards(spark):
    from pangool_spark.operators.dedup import hamming_neardup_pairs

    df = spark.createDataFrame([(1, "00" * 8)], ["media_id", "dhash"])
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_neardup_pairs(df, max_dist=8, n_bands=8)
    with pytest.raises(ValueError, match="hex-aligned"):
        hamming_neardup_pairs(df, n_bands=3)


# ---------------------------------------------------------------------------
# hard_negatives


def test_hard_negatives_masks_same_label(spark):
    from pangool_spark.operators.similarity import hard_negatives

    # Query 1 (label 0) points along +x. Same-direction id 2 shares its
    # label (masked); id 3 (label 1) is the nearest allowed negative even
    # though id 2 is geometrically closer.
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.01], 0),
        (3, [0.9, 0.1], 1),
        (4, [0.0, 1.0], 1),
        (5, [-1.0, 0.0], 2),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = hard_negatives(df, df.filter(F.col("vec_id") == 1), k=2)
    got = [(r["neighbor_id"], r["rank"]) for r in out.orderBy("rank").collect()]
    assert got == [(3, 1), (4, 2)]


def test_hard_negatives_matches_numpy(spark):
    import numpy as np

    from pangool_spark.operators.similarity import hard_negatives

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype(float)
    labels = [int(i % 3) for i in range(40)]
    rows = [(i, [float(x) for x in vecs[i]], labels[i]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).repartition(4)
    out = hard_negatives(df, df.filter(F.col("vec_id") < 5), k=3)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()
    }

    unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    sims = unit @ unit.T
    for q in range(5):
        order = sorted(
            (i for i in range(40) if labels[i] != labels[q] and i != q),
            key=lambda i: (-sims[q, i], i),
        )
        for rank, i in enumerate(order[:3], start=1):
            assert got[(q, rank)] == i


def test_hard_negatives_empty_queries(spark):
    from pangool_spark.operators.similarity import hard_negatives

    df = spark.createDataFrame([(1, [1.0, 0.0], 0)], ["vec_id", "embedding", "label"])
    out = hard_negatives(df, df.filter(F.col("vec_id") < 0), k=3)
    assert out.count() == 0
