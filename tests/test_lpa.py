"""lpa_communities vs a brute-force synchronous LPA, plus the
two-cliques-one-bridge case where communities split but CC would not."""

import random
from collections import defaultdict

import pytest

from pangool_spark.operators.graph import lpa_communities


def _brute_lpa(edges, rounds):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v in adj:
            votes = defaultdict(int)
            for n in adj[v]:
                votes[labels[n]] += 1
            # max count, then smallest label
            nxt[v] = min(votes, key=lambda l: (-votes[l], l))
        labels = nxt
    return set(labels.items())


def _run(spark, edges, rounds):
    df = spark.createDataFrame(edges, "src int, dst int")
    return {
        (r["v"], r["label"])
        for r in lpa_communities(df, rounds=rounds).collect()
    }


def test_lpa_matches_bruteforce_random(spark):
    rng = random.Random(17)
    edges = list(
        {
            (rng.randint(0, 25), rng.randint(0, 25))
            for _ in range(60)
        }
    )
    for rounds in (1, 2, 3):
        assert _run(spark, edges, rounds) == _brute_lpa(edges, rounds)


def test_lpa_splits_bridged_cliques(spark):
    # two 4-cliques joined by one bridge: same CC, two LPA communities
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = c1 + c2 + [(3, 10)]
    got = _run(spark, edges, 3)
    assert got == _brute_lpa(edges, 3)
    labels = {v: l for v, l in got}
    assert len({labels[v] for v in range(4)}) == 1
    assert len({labels[v] for v in range(10, 14)}) == 1
    assert labels[0] != labels[13]


def test_lpa_guards(spark):
    df = spark.createDataFrame([(1, 2)], "src int, dst int")
    with pytest.raises(ValueError, match="rounds"):
        lpa_communities(df, rounds=0)
