"""kmeans_lloyd / kmeans_assign: parity with a pure-Python Lloyd
reference on the same deterministic contract (int64 grid, portable-hash
init, lowest-index tie-break, empty-cluster carry), partitioning
invariance, and the guard rails."""

import hashlib
import math
import random

import pytest

from pangool_spark.operators.ml import kmeans_assign, kmeans_lloyd


def h31(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) & 0x7FFFFFFF


def py_lloyd(rows, k, iterations, scale):
    """Reference Lloyd on the identical contract."""
    q = {i: [math.floor(float(x) * float(scale)) for x in v] for i, v in rows}
    seeds = sorted(q, key=lambda i: (h31(str(i)), i))[:k]
    cents = [[float(x) for x in q[i]] for i in seeds]

    def assign():
        out = {}
        for i, qi in q.items():
            dists = []
            for c in cents:
                t = 0.0
                for d in range(len(c)):
                    diff = float(qi[d]) - c[d]
                    t += diff * diff
                dists.append(t)
            m = min(dists)
            j = dists.index(m)
            out[i] = (j, m)
        return out

    for _ in range(iterations):
        a = assign()
        sums = {}
        for i, (j, _m) in a.items():
            s, n = sums.setdefault(j, ([0] * len(q[i]), 0))
            for d, x in enumerate(q[i]):
                s[d] += x
            sums[j] = (s, n + 1)
        for j, (s, n) in sums.items():
            cents[j] = [float(x) / float(n) for x in s]
    return assign(), cents


def rand_rows(rng, n, dim):
    return [
        (i, [rng.uniform(-0.6, 0.6) for _ in range(dim)]) for i in range(n)
    ]


def test_matches_python_reference(spark):
    rng = random.Random(7)
    rows = rand_rows(rng, 60, 5)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got, cents = kmeans_lloyd(df, k=3, iterations=2, dim=5)
    want, want_cents = py_lloyd(rows, 3, 2, 1_000_000)
    assert cents == want_cents
    for r in got.collect():
        wj, wd = want[r["vec_id"]]
        assert (r["cluster"], r["dist2"]) == (wj, wd)


def test_partitioning_invariance(spark):
    rng = random.Random(11)
    rows = rand_rows(rng, 80, 4)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a, ca = kmeans_lloyd(df, k=4, iterations=2, dim=4)
    b, cb = kmeans_lloyd(df.repartition(13), k=4, iterations=2, dim=4)
    assert ca == cb
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_separates_obvious_blobs(spark):
    rng = random.Random(3)
    rows = [(i, [rng.uniform(0.4, 0.5), rng.uniform(0.4, 0.5)]) for i in range(20)]
    rows += [(100 + i, [rng.uniform(-0.5, -0.4), rng.uniform(-0.5, -0.4)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got, _ = kmeans_lloyd(df, k=2, iterations=3, dim=2)
    by_cluster = {}
    for r in got.collect():
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"] < 100)
    assert len(by_cluster) == 2
    for members in by_cluster.values():
        assert len(members) == 1  # each cluster is pure


def test_empty_cluster_keeps_centroid(spark):
    # two distinct points, k=3: one seed never wins any vector, so its
    # centroid must carry forward unchanged through the update rounds
    rows = [(0, [0.1, 0.1]), (1, [0.1, 0.1]), (2, [-0.1, -0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got, cents = kmeans_lloyd(df, k=3, iterations=2, dim=2)
    want, want_cents = py_lloyd(rows, 3, 2, 1_000_000)
    assert cents == want_cents
    for r in got.collect():
        assert (r["cluster"], r["dist2"]) == want[r["vec_id"]]


def test_null_and_wrong_dim_rows_dropped(spark):
    rows = [(0, [0.1, 0.2]), (1, None), (2, [0.3]), (3, [0.2, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got, _ = kmeans_lloyd(df, k=2, iterations=1, dim=2)
    assert sorted(r["vec_id"] for r in got.collect()) == [0, 3]


def test_k_exceeds_rows_raises(spark):
    df = spark.createDataFrame(
        [(0, [0.1]), (1, [0.2])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_lloyd(df, k=5, iterations=1, dim=1)


def test_sum_overflow_guard_raises(spark):
    df = spark.createDataFrame(
        [(i, [0.5]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="2\\^53"):
        kmeans_lloyd(df, k=1, iterations=1, scale=10**17, dim=1)


def test_assign_matches_fit_assignment(spark):
    rng = random.Random(23)
    rows = rand_rows(rng, 40, 3)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fit, cents = kmeans_lloyd(df, k=3, iterations=2, dim=3)
    swept = kmeans_assign(df, cents)
    assert sorted(map(tuple, fit.collect())) == sorted(map(tuple, swept.collect()))
