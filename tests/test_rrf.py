"""rrf_fuse: python-reference parity, single-ranker degeneracy,
missing-item semantics, tie-break determinism, guards."""

import random

import pytest

from pangool_spark.operators.similarity import rrf_fuse


def py_rrf(rankings, c=60, top_k=None):
    scores = {}
    for r in rankings:
        for qid, item, rank in r:
            key = (qid, item)
            n, contribs = scores.get(key, (0, []))
            scores[key] = (n + 1, contribs + [1.0 / (float(c) + float(rank))])
    fused = {}
    for (qid, item), (n, contribs) in scores.items():
        s = 0.0
        for x in sorted(contribs):
            s += x
        fused.setdefault(qid, []).append((item, n, s))
    out = {}
    for qid, items in fused.items():
        items.sort(key=lambda t: (-t[2], t[0]))
        for rank, (item, n, s) in enumerate(items, 1):
            if top_k is None or rank <= top_k:
                out[(qid, item)] = (n, s, rank)
    return out


def to_df(spark, rows):
    return spark.createDataFrame(rows, "query_id long, item_id long, rank int")


def collect(df):
    return {
        (r["query_id"], r["item_id"]): (r["n_rankers"], r["rrf_score"], r["rank"])
        for r in df.collect()
    }


def test_matches_python_reference(spark):
    rng = random.Random(17)
    rankers = []
    for _ in range(3):
        rows = []
        for q in range(4):
            items = rng.sample(range(30), 8)
            rows += [(q, item, i + 1) for i, item in enumerate(items)]
        rankers.append(rows)
    got = collect(rrf_fuse([to_df(spark, r) for r in rankers]))
    assert got == py_rrf(rankers)


def test_item_in_both_rankers_beats_single(spark):
    a = [(1, 10, 1), (1, 11, 2)]
    b = [(1, 11, 1), (1, 12, 2)]
    got = collect(rrf_fuse([to_df(spark, a), to_df(spark, b)]))
    assert got[(1, 11)][0] == 2  # fused from both
    assert got[(1, 11)][2] == 1  # 1/62+1/61 > 1/61 alone
    assert got == py_rrf([a, b])


def test_tie_breaks_on_item_id(spark):
    a = [(1, 20, 1), (1, 5, 1)]  # identical contributions
    got = collect(rrf_fuse([to_df(spark, a)]))
    assert got[(1, 5)][2] == 1 and got[(1, 20)][2] == 2


def test_top_k_and_partitioning_invariance(spark):
    rng = random.Random(29)
    rows = [(q, item, rng.randint(1, 50)) for q in range(3) for item in range(40)]
    df = to_df(spark, rows)
    a = collect(rrf_fuse([df], top_k=5))
    b = collect(rrf_fuse([df.repartition(11)], top_k=5))
    assert a == b
    assert all(rank <= 5 for _n, _s, rank in a.values())


def test_guards(spark):
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="c must be"):
        rrf_fuse([to_df(spark, [(1, 1, 1)])], c=0)
