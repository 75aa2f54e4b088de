"""Round-9 batch-5 operators: sorted_neighborhood_pairs (SNM blocking)
and decision_stump (depth-1 Gini tree)."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# sorted_neighborhood_pairs


def test_snm_finds_prefix_typos_qgram_misses(spark):
    from pangool_spark.operators.fuzzy import sorted_neighborhood_pairs

    # 'apple' vs 'bpple': every q-gram shifted, but adjacent in any sort
    # that lands them near each other? They sort apart — use suffix typo
    # 'apple'/'applf' (adjacent in sort) and a far pair.
    rows = [
        (1, "apple"),
        (2, "applf"),
        (3, "zebra"),
        (4, "zebrb"),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = sorted_neighborhood_pairs(df, "id", "name", window=1, max_distance=1)
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in out.collect()}
    assert got == {(1, 2): 1, (3, 4): 1}


def test_snm_window_completeness_across_blocks(spark):
    from pangool_spark.operators.fuzzy import sorted_neighborhood_pairs

    # 12 identical-prefix names: with window=3 every pair within 3 ranks
    # must appear regardless of block boundaries (block = rank div 3)
    rows = [(i, f"name{i:02d}") for i in range(12)]
    df = spark.createDataFrame(rows, ["id", "name"]).repartition(5)
    out = sorted_neighborhood_pairs(
        df, "id", "name", window=3, max_distance=2
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # names sort by id here; all rank-distance<=3 pairs with edit dist<=2.
    # nameAB vs nameCD differ in <=2 positions always, so expect exactly
    # the rank-window pairs
    expected = {
        (i, j) for i in range(12) for j in range(12) if 0 < j - i <= 3
    }
    assert pairs == expected


def test_snm_key_columns_and_guards(spark):
    from pangool_spark.operators.fuzzy import sorted_neighborhood_pairs

    df = spark.createDataFrame([(2, "ab"), (1, "ac")], ["id", "name"])
    [r] = sorted_neighborhood_pairs(
        df, "id", "name", window=2, max_distance=1
    ).collect()
    assert (r["id_a"], r["id_b"], r["key_a"], r["key_b"]) == (1, 2, "ac", "ab")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "id", "name", window=0)


# ---------------------------------------------------------------------------
# decision_stump


def test_stump_finds_perfect_split(spark):
    from pangool_spark.operators.ml import decision_stump

    # y = 1 iff x >= 10: best split is x <= 5 (largest left value below 10)
    rows = [(x, 0) for x in [1, 3, 5]] + [(x, 1) for x in [10, 12, 14]]
    df = spark.createDataFrame(rows, "x BIGINT, y BIGINT").repartition(3)
    [r] = decision_stump(df, "y", ["x"]).collect()
    assert r["feature"] == "x"
    assert r["threshold"] == 5
    assert r["cost"] == pytest.approx(0.0)
    assert (r["n_left"], r["n_right"]) == (3, 3)
    assert (r["pos_left"], r["pos_right"]) == (0, 3)


def test_stump_matches_sklearn_style_gini(spark):
    import numpy as np

    from pangool_spark.operators.ml import decision_stump

    rng = np.random.RandomState(11)
    x = rng.randint(0, 20, size=60)
    y = (x + rng.randint(-3, 4, size=60) > 10).astype(int)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], "x BIGINT, y BIGINT"
    ).repartition(4)
    [r] = decision_stump(df, "y", ["x"]).collect()

    best = None
    for t in sorted(set(x))[:-1]:
        l, rr = y[x <= t], y[x > t]
        cost = 2 * l.sum() * (len(l) - l.sum()) / len(l) + 2 * rr.sum() * (
            len(rr) - rr.sum()
        ) / len(rr)
        if best is None or cost < best[1] - 1e-12:
            best = (t, cost)
    assert r["threshold"] == best[0]
    assert r["cost"] == pytest.approx(best[1], rel=1e-12)


def test_stump_multi_feature_picks_per_feature(spark):
    from pangool_spark.operators.ml import decision_stump

    # feature a separates perfectly, feature b is noise
    rows = [(0, 5, 0), (1, 9, 0), (10, 6, 1), (11, 8, 1)]
    df = spark.createDataFrame(rows, "a BIGINT, b BIGINT, y BIGINT")
    got = {r["feature"]: r for r in decision_stump(df, "y", ["a", "b"]).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["cost"] == pytest.approx(0.0)
    assert got["b"]["cost"] > got["a"]["cost"]


def test_stump_guards(spark):
    from pangool_spark.operators.ml import decision_stump

    df = spark.createDataFrame([(1, 2)], "x BIGINT, y BIGINT")
    with pytest.raises(ValueError, match="feature"):
        decision_stump(df, "y", [])
    bad = spark.createDataFrame([(1, 0.5)], "x BIGINT, y DOUBLE")
    with pytest.raises(ValueError, match="integer 0/1"):
        decision_stump(bad, "y", ["x"])
    # non-binary integer labels raise at execution
    nb = spark.createDataFrame([(1, 2), (2, 0)], "x BIGINT, y BIGINT")
    with pytest.raises(Exception, match="0/1"):
        decision_stump(nb, "y", ["x"]).collect()
