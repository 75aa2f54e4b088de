"""personalized_pagerank: python-reference parity, seed locality,
missing-seed guard, partitioning invariance."""

import random

import pytest

from pangool_spark.operators.graph import personalized_pagerank


def py_ppr(edge_list, seeds, iterations, damping=0.85):
    edges = sorted({(a, b) for a, b in edge_list})
    nodes = sorted({v for e in edges for v in e})
    outdeg = {}
    for a, _b in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    s = sorted(set(seeds))
    rank = {v: (1.0 / len(s) if v in s else 0.0) for v in nodes}
    tele = {v: ((1.0 - damping) / len(s) if v in s else 0.0) for v in nodes}
    for _ in range(iterations):
        from decimal import Decimal

        csum = {}
        for a, b in edges:
            c = Decimal(repr(rank[a] / outdeg[a])).quantize(Decimal(1).scaleb(-18))
            csum[b] = csum.get(b, Decimal(0)) + c
        rank = {
            v: tele[v] + damping * float(csum.get(v, Decimal(0)))
            for v in nodes
        }
    return rank


def test_matches_python_reference(spark):
    rng = random.Random(3)
    edge_list = [(rng.randrange(12), 100 + rng.randrange(12)) for _ in range(40)]
    seeds = [edge_list[0][0], edge_list[1][0]]
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, seeds, iterations=3).collect()
    }
    want = py_ppr(edge_list, seeds, 3)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v


def test_mass_concentrates_at_seeds(spark):
    # chain 1->2->3->4 at (near-)fixpoint: rank decays geometrically with
    # distance from the seed (r_{k+1} = d * r_k along the chain; the seed
    # holds the full teleport mass 1-d). Few-round iterates are NOT yet
    # monotone — the walk front marches before it mixes — so run enough
    # rounds to converge.
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, [1], iterations=24).collect()
    }
    assert got[1] > got[2] > got[3] > got[4] >= 0.0
    assert abs(got[1] - 0.15) < 1e-9
    assert abs(got[2] - 0.85 * got[1]) < 1e-9


def test_missing_seed_raises(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="absent"):
        personalized_pagerank(df, [1, 99], iterations=1).collect()


def test_partitioning_invariance(spark):
    rng = random.Random(9)
    edge_list = [(rng.randrange(20), rng.randrange(20)) for _ in range(60)]
    edge_list = [(a, b) for a, b in edge_list if a != b]
    df = spark.createDataFrame(edge_list, "src long, dst long")
    seeds = [edge_list[0][0]]
    a = personalized_pagerank(df, seeds, iterations=2).collect()
    b = personalized_pagerank(df.repartition(13), seeds, iterations=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_guards(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="seeds"):
        personalized_pagerank(df, [], iterations=1)
    with pytest.raises(ValueError, match="iterations"):
        personalized_pagerank(df, [1], iterations=0)
