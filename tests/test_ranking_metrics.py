"""ranking_metrics vs a hand-computed NDCG/MRR reference, the perfect-
and worst-ordering bounds, the no-relevant edge, and guards."""

import math

import pytest

from pangool_spark.operators.ml import ranking_metrics


def _dcg(rels_in_rank_order, k):
    return sum(
        (2**r - 1) / math.log2(i + 2)
        for i, r in enumerate(rels_in_rank_order[:k])
    )


def test_hand_computed_ndcg_and_rr(spark):
    rels = [0, 3, 1, 0, 2]  # relevance by rank position 1..5
    rows = [("q1", i + 1, r) for i, r in enumerate(rels)]
    df = spark.createDataFrame(rows, "q string, rnk int, rel int")
    [got] = ranking_metrics(df, "q", "rnk", "rel", k=3).collect()
    assert got["n_items"] == 5
    assert got["dcg"] == pytest.approx(_dcg(rels, 3), abs=1e-5)
    ideal = sorted(rels, reverse=True)
    assert got["idcg"] == pytest.approx(_dcg(ideal, 3), abs=1e-5)
    assert got["ndcg"] == pytest.approx(_dcg(rels, 3) / _dcg(ideal, 3), abs=1e-5)
    assert got["rr"] == pytest.approx(1 / 2, abs=0.0)  # first relevant at rank 2


def test_perfect_ordering_is_one_and_reversed_is_less(spark):
    rels = [5, 4, 3, 2, 1, 0]
    perfect = [("p", i + 1, r) for i, r in enumerate(rels)]
    reverse = [("r", i + 1, r) for i, r in enumerate(reversed(rels))]
    df = spark.createDataFrame(perfect + reverse, "q string, rnk int, rel int")
    got = {r["q"]: r for r in ranking_metrics(df, "q", "rnk", "rel", k=6).collect()}
    assert got["p"]["ndcg"] == pytest.approx(1.0, abs=1e-6)
    assert got["p"]["rr"] == 1.0
    assert got["r"]["ndcg"] < got["p"]["ndcg"]
    assert got["r"]["rr"] == pytest.approx(1 / 2, abs=0.0)


def test_no_relevant_items(spark):
    df = spark.createDataFrame(
        [("q", 1, 0), ("q", 2, 0)], "q string, rnk int, rel int"
    )
    [got] = ranking_metrics(df, "q", "rnk", "rel", k=10).collect()
    assert got["ndcg"] is None and got["rr"] == 0.0 and got["dcg"] == 0.0


def test_k_guard_and_null_rows(spark):
    df = spark.createDataFrame(
        [("q", 1, 2), ("q", None, 1), ("q", 3, None)],
        "q string, rnk int, rel int",
    )
    with pytest.raises(ValueError):
        ranking_metrics(df, "q", "rnk", "rel", k=0)
    [got] = ranking_metrics(df, "q", "rnk", "rel", k=5).collect()
    assert got["n_items"] == 1  # NULL rank/rel rows excluded
