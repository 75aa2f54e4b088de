"""ks_test and auc_score: exact rank/CDF statistics with scipy-free
reference cross-checks."""

import pytest


def test_ks_identical_zero_disjoint_one(spark):
    from pangool_spark.operators.stats import ks_test

    rows = [("g", 0, v) for v in range(10)] + [("g", 1, v) for v in range(10)]
    df = spark.createDataFrame(rows, "g STRING, arm BIGINT, v BIGINT")
    [r] = ks_test(df, ["g"], "arm", "v").collect()
    assert r["d"] == pytest.approx(0.0)
    rows2 = [("g", 0, v) for v in range(10)] + [
        ("g", 1, v + 100) for v in range(10)
    ]
    df2 = spark.createDataFrame(rows2, "g STRING, arm BIGINT, v BIGINT")
    [r2] = ks_test(df2, ["g"], "arm", "v").collect()
    assert r2["d"] == pytest.approx(1.0)
    assert (r2["n_a"], r2["n_b"]) == (10, 10)


def test_ks_matches_reference(spark):
    import numpy as np

    from pangool_spark.operators.stats import ks_test

    rng = np.random.RandomState(9)
    a = rng.randint(0, 40, size=80)
    b = rng.randint(10, 50, size=60)
    rows = [("g", 0, int(v)) for v in a] + [("g", 1, int(v)) for v in b]
    df = spark.createDataFrame(rows, "g STRING, arm BIGINT, v BIGINT").repartition(4)
    [r] = ks_test(df, ["g"], "arm", "v").collect()
    # reference: exact D over the pooled support
    support = sorted(set(a) | set(b))
    d_ref = max(
        abs((a <= v).sum() / len(a) - (b <= v).sum() / len(b))
        for v in support
    )
    assert r["d"] == pytest.approx(d_ref, rel=1e-12)


def test_ks_empty_arm_null(spark):
    from pangool_spark.operators.stats import ks_test

    df = spark.createDataFrame(
        [("g", 0, 1), ("g", 0, 2)], "g STRING, arm BIGINT, v BIGINT"
    )
    [r] = ks_test(df, ["g"], "arm", "v").collect()
    assert r["d"] is None and r["n_b"] == 0


def test_auc_perfect_random_inverted(spark):
    from pangool_spark.operators.stats import auc_score

    # perfectly separating score -> 1.0; inverted -> 0.0
    rows = [("g", 0, s) for s in [1, 2, 3]] + [("g", 1, s) for s in [10, 11]]
    df = spark.createDataFrame(rows, "g STRING, y BIGINT, s BIGINT")
    [r] = auc_score(df, ["g"], "y", "s").collect()
    assert r["auc"] == pytest.approx(1.0)
    assert (r["n_pos"], r["n_neg"]) == (2, 3)
    inv = spark.createDataFrame(
        [("g", 1, 1), ("g", 0, 10)], "g STRING, y BIGINT, s BIGINT"
    )
    [r2] = auc_score(inv, ["g"], "y", "s").collect()
    assert r2["auc"] == pytest.approx(0.0)


def test_auc_ties_count_half_and_matches_pairwise(spark):
    import numpy as np

    from pangool_spark.operators.stats import auc_score

    rng = np.random.RandomState(4)
    y = rng.randint(0, 2, size=60)
    s = rng.randint(0, 8, size=60)  # heavy ties
    df = spark.createDataFrame(
        [("g", int(a), int(b)) for a, b in zip(y, s)],
        "g STRING, y BIGINT, s BIGINT",
    ).repartition(5)
    [r] = auc_score(df, ["g"], "y", "s").collect()
    pos, neg = s[y == 1], s[y == 0]
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    assert r["auc"] == pytest.approx(wins / (len(pos) * len(neg)), rel=1e-12)


def test_auc_rejects_fractional_score(spark):
    from pangool_spark.operators.stats import auc_score

    df = spark.createDataFrame([("g", 1, 0.5)], "g STRING, y BIGINT, s DOUBLE")
    with pytest.raises(ValueError, match="integer-typed"):
        auc_score(df, ["g"], "y", "s")
