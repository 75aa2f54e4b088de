"""Similarity-search operator semantics (kNN exactness, LSH recall)."""

import math

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.similarity import (
    cosine_similarity,
    ivf_assign,
    knn_bruteforce,
    lsh_bucket,
    lsh_cosine_pairs,
)


@pytest.fixture(scope="module")
def emb(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(8)]
        rows.append((i, v))
    # planted near-dup pair: 100 ≈ 101
    base = [rng.gauss(0, 1) for _ in range(8)]
    rows.append((100, base))
    rows.append((101, [x + 0.001 for x in base]))
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vec_id LONG, embedding ARRAY<FLOAT>"
    )


def test_cosine_similarity_rowwise(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], "a ARRAY<FLOAT>, b ARRAY<FLOAT>"
    )
    got = [r.cosine for r in cosine_similarity(df, "a", "b").collect()]
    assert got[0] == pytest.approx(0.0, abs=1e-9)
    assert got[1] == pytest.approx(1.0, abs=1e-9)


def test_knn_exact_vs_python(emb):
    data = {r.vec_id: list(r.embedding) for r in emb.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    queries = emb.filter(F.col("vec_id") < 3)
    out = knn_bruteforce(emb, queries, k=4)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for q in (0, 1, 2):
        expected = sorted(
            ((cos(data[q], data[i]), i) for i in data if i != q),
            key=lambda t: (-t[0], t[1]),
        )[:4]
        assert [i for _, i in sorted(got[q])] == [i for _, i in expected]


def test_knn_excludes_self(emb):
    out = knn_bruteforce(emb, emb.filter(F.col("vec_id") == 0), k=3)
    assert all(r.neighbor_id != 0 for r in out.collect())


def test_lsh_pairs_finds_planted_dup(emb):
    pairs = {(r.id_a, r.id_b) for r in lsh_cosine_pairs(emb, dim=8, threshold=0.99, n_planes=8, n_tables=8).collect()}
    assert (100, 101) in pairs


def test_lsh_bucket_deterministic(emb):
    b1 = {r.vec_id: r.bucket for r in lsh_bucket(emb, dim=8).collect()}
    b2 = {r.vec_id: r.bucket for r in lsh_bucket(emb, dim=8).collect()}
    assert b1 == b2
    assert b1[100] == b1[101]  # near-identical vectors share a bucket


def test_ivf_assign(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    out = {r.vec_id: r.cell for r in ivf_assign(emb, [[1.0, 0.0], [0.0, 1.0]]).collect()}
    assert out == {1: 0, 2: 0, 3: 1}


def test_kmeans_centroids_feed_ivf_and_semantic_dedup(spark):
    import numpy as np

    from pangool_spark.operators.dedup import semantic_dedup
    from pangool_spark.operators.similarity import ivf_assign, kmeans_centroids

    rng = np.random.RandomState(0)
    blob_a = rng.normal([10, 0, 0, 0], 0.1, (30, 4))
    blob_b = rng.normal([0, 10, 0, 0], 0.1, (30, 4))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(np.vstack([blob_a, blob_b]))]
    # planted near-dup pair inside blob A
    rows.append((100, rows[0][1]))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")

    cents = kmeans_centroids(df, k=2, max_iter=10)
    assert len(cents) == 2 and len(cents[0]) == 4
    # the two centers land near the blob means (order unknown)
    norms = sorted(round(max(c), 0) for c in cents)
    assert norms == [10.0, 10.0]

    assigned = ivf_assign(df, cents)
    n_cells = assigned.select("cell").distinct().count()
    assert n_cells == 2

    survivors = {r.vec_id for r in semantic_dedup(df, cents, threshold=0.999).collect()}
    assert 0 in survivors and 100 not in survivors  # planted dup dropped
