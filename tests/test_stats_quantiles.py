"""grouped_linreg (closed-form OLS, exact-integer vs decimal paths) and
approx_quantiles_sampled (deterministic hash-sample quantiles)."""

import pytest
from pyspark.sql import functions as F


def test_grouped_linreg_exact_fit(spark):
    from pangool_spark.operators.stats import grouped_linreg

    # perfect line y = 3x + 7 for key a; degenerate cases for b, c, d
    rows = (
        [("a", x, 3 * x + 7) for x in range(10)]
        + [("b", 5, 1), ("b", 5, 9)]        # zero x-variance
        + [("c", 1, 4)]                      # single point
        + [("d", 1, 10), ("d", 2, None), ("d", 3, 30)]  # null y excluded
    )
    df = spark.createDataFrame(rows, "k STRING, x LONG, y LONG")
    got = {r.k: (r.n, r.slope, r.intercept) for r in grouped_linreg(df, ["k"], "x", "y").collect()}
    assert got["a"] == (10, 3.0, 7.0)
    assert got["b"][0] == 2 and got["b"][1] is None and got["b"][2] is None
    assert got["c"] == (1, None, None)
    # d: pairwise exclusion leaves (1,10),(3,30) -> slope 10, intercept 0
    assert got["d"] == (2, 10.0, 0.0)
    with pytest.raises(ValueError, match="group column"):
        grouped_linreg(df, [], "x", "y")
    with pytest.raises(ValueError, match="scale"):
        grouped_linreg(df, ["k"], "x", "y", scale=40)


def test_grouped_linreg_double_path_matches_numpy(spark):
    import numpy as np

    from pangool_spark.operators.stats import grouped_linreg

    rng = np.random.default_rng(7)
    xs = rng.uniform(0, 100, 200)
    ys = 1.5 * xs - 4.0 + rng.normal(0, 2, 200)
    df = spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in zip(xs, ys)],
        "k STRING, x DOUBLE, y DOUBLE",
    )
    r = grouped_linreg(df, ["k"], "x", "y").collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    assert r.n == 200
    assert abs(r.slope - slope) < 1e-9
    assert abs(r.intercept - intercept) < 1e-7


def test_approx_quantiles_sampled(spark):
    from pangool_spark.operators.sampling import approx_quantiles_sampled

    df = spark.createDataFrame(
        [(i, float(i % 1000)) for i in range(20000)], "id LONG, v DOUBLE"
    )
    got = {r.p: r.value for r in approx_quantiles_sampled(df, "v", [0.5, 0.99], key_col="id", fraction=0.2).collect()}
    assert set(got) == {0.5, 0.99}
    # uniform 0..999: sampled medians land near 500, p99 near 990
    assert 450 <= got[0.5] <= 550
    assert 955 <= got[0.99] <= 1000
    # deterministic: identical on rerun
    again = {r.p: r.value for r in approx_quantiles_sampled(df, "v", [0.5, 0.99], key_col="id", fraction=0.2).collect()}
    assert got == again
    # fraction=1.0 degenerates to the exact percentile
    full = {r.p: r.value for r in approx_quantiles_sampled(df, "v", [0.5], key_col="id", fraction=1.0).collect()}
    exact = df.agg(F.percentile("v", 0.5)).collect()[0][0]
    assert full[0.5] == exact
    with pytest.raises(ValueError, match="probs"):
        approx_quantiles_sampled(df, "v", [])
    with pytest.raises(ValueError, match="probs"):
        approx_quantiles_sampled(df, "v", [1.5])
    with pytest.raises(ValueError, match="fraction"):
        approx_quantiles_sampled(df, "v", [0.5], fraction=0.0)


def test_grouped_corr(spark):
    import math

    from pangool_spark.operators.stats import grouped_corr

    rows = (
        [("pos", x, 2 * x + 1) for x in range(8)]       # perfect +1
        + [("neg", x, -3 * x + 40) for x in range(8)]   # perfect -1
        + [("flat", x, 5) for x in range(8)]            # zero y-variance
        + [("one", 3, 9)]
        + [("mix", 1, 1), ("mix", 2, 5), ("mix", 3, 2), ("mix", 4, 8)]
    )
    df = spark.createDataFrame(rows, "k STRING, x LONG, y LONG")
    got = {r.k: (r.n, r.corr) for r in grouped_corr(df, ["k"], "x", "y").collect()}
    assert got["pos"] == (8, 1.0)
    assert got["neg"] == (8, -1.0)
    assert got["flat"][1] is None and got["one"][1] is None
    # mix: cross-check against statistics.correlation
    import statistics

    want = statistics.correlation([1, 2, 3, 4], [1, 5, 2, 8])
    assert math.isclose(got["mix"][1], want, rel_tol=1e-12)
    with pytest.raises(ValueError, match="group column"):
        grouped_corr(df, [], "x", "y")
