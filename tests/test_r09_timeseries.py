"""Round-9 time-series statistics: grouped_acf, changepoint_binary,
theil_sen — hand-computed fixtures plus numpy cross-checks."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# grouped_acf


def _acf_rows(df):
    return {(r["lag"]): (r["n"], r["n_pairs"], r["acf"]) for r in df.collect()}


def test_acf_matches_numpy(spark):
    import numpy as np

    from pangool_spark.operators.stats import grouped_acf

    series = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    rows = [("g", i, v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, ["g", "t", "x"]).repartition(4)
    got = _acf_rows(grouped_acf(df, ["g"], ["t"], "x", max_lag=3))

    x = np.array(series, dtype=float)
    xbar = x.mean()
    den = ((x - xbar) ** 2).sum()
    for k in range(1, 4):
        num = ((x[:-k] - xbar) * (x[k:] - xbar)).sum()
        n, npairs, acf = got[k]
        assert n == len(series)
        assert npairs == len(series) - k
        assert acf == pytest.approx(num / den, rel=1e-12)


def test_acf_constant_series_null(spark):
    from pangool_spark.operators.stats import grouped_acf

    df = spark.createDataFrame(
        [("g", i, 7) for i in range(5)], ["g", "t", "x"]
    )
    got = _acf_rows(grouped_acf(df, ["g"], ["t"], "x", max_lag=2))
    assert got[1][2] is None and got[2][2] is None


def test_acf_short_series(spark):
    from pangool_spark.operators.stats import grouped_acf

    # length 2, lag 2 has no pairs -> NULL acf, n_pairs 0
    df = spark.createDataFrame([("g", 0, 1), ("g", 1, 5)], ["g", "t", "x"])
    got = _acf_rows(grouped_acf(df, ["g"], ["t"], "x", max_lag=2))
    assert got[2] == (2, 0, None)


def test_acf_null_values_dropped(spark):
    """Regression (ADVICE r09): value-NULL rows must not inflate n, x-bar
    or the variance denominator — the NULL-padded series must give the
    same acf as the series without the NULL rows."""
    from pangool_spark.operators.stats import grouped_acf

    series = [3, 1, 4, 1, 5, 9, 2, 6]
    clean = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(series)], "g STRING, t INT, x BIGINT"
    )
    padded = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(series)]
        + [("g", 100 + i, None) for i in range(3)],
        "g STRING, t INT, x BIGINT",
    )
    want = _acf_rows(grouped_acf(clean, ["g"], ["t"], "x", max_lag=2))
    got = _acf_rows(grouped_acf(padded, ["g"], ["t"], "x", max_lag=2))
    assert got == want
    assert got[1][0] == len(series)  # n counts only non-NULL rows


def test_acf_rejects_fractional(spark):
    from pangool_spark.operators.stats import grouped_acf

    df = spark.createDataFrame([("g", 0, 1.5)], ["g", "t", "x"])
    with pytest.raises(ValueError, match="integer-typed"):
        grouped_acf(df, ["g"], ["t"], "x")


# ---------------------------------------------------------------------------
# changepoint_binary


def test_changepoint_finds_mean_shift(spark):
    from pangool_spark.operators.stats import changepoint_binary

    series = [10, 11, 10, 11, 50, 51, 50, 51]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(series)], ["g", "t", "x"]
    ).repartition(3)
    [row] = changepoint_binary(df, ["g"], ["t"], "x").collect()
    assert row["cp_idx"] == 4 and row["n"] == 8
    # gain equals the SSE reduction of the best split
    import numpy as np

    x = np.array(series, dtype=float)
    sse = lambda v: ((v - v.mean()) ** 2).sum() if len(v) else 0.0
    best = min(range(1, 8), key=lambda i: sse(x[:i]) + sse(x[i:]))
    assert best == 4
    expected_gain = sse(x) - (sse(x[:4]) + sse(x[4:]))
    assert row["gain"] == pytest.approx(expected_gain, rel=1e-12)


def test_changepoint_tie_breaks_smallest_index(spark):
    from pangool_spark.operators.stats import changepoint_binary

    # symmetric series: split after 1 and after 3 give equal gain
    df = spark.createDataFrame(
        [("g", 0, 5), ("g", 1, 0), ("g", 2, 0), ("g", 3, 5)],
        ["g", "t", "x"],
    )
    [row] = changepoint_binary(df, ["g"], ["t"], "x").collect()
    assert row["cp_idx"] == 1


def test_changepoint_negative_values(spark):
    """Regression (ADVICE r09): S_n must be the true series total, not
    max of the running sum — with negative values a prefix sum can exceed
    the final sum, silently corrupting every gain."""
    import numpy as np

    from pangool_spark.operators.stats import changepoint_binary

    # running sums: 10, 22, -8, -18 -> max(si)=22 but true total is -18
    series = [10, 12, -30, -10]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(series)], ["g", "t", "x"]
    ).repartition(2)
    [row] = changepoint_binary(df, ["g"], ["t"], "x").collect()
    x = np.array(series, dtype=float)
    sse = lambda v: ((v - v.mean()) ** 2).sum() if len(v) else 0.0
    best = min(range(1, 4), key=lambda i: sse(x[:i]) + sse(x[i:]))
    assert row["cp_idx"] == best
    expected_gain = sse(x) - (sse(x[:best]) + sse(x[best:]))
    assert row["gain"] == pytest.approx(expected_gain, rel=1e-12)


def test_changepoint_singleton_group_absent(spark):
    from pangool_spark.operators.stats import changepoint_binary

    df = spark.createDataFrame(
        [("a", 0, 1), ("b", 0, 2), ("b", 1, 9)], ["g", "t", "x"]
    )
    got = {r["g"]: r for r in changepoint_binary(df, ["g"], ["t"], "x").collect()}
    assert set(got) == {"b"}


# ---------------------------------------------------------------------------
# theil_sen


def test_theil_sen_ignores_outlier(spark):
    from pangool_spark.operators.stats import grouped_linreg, theil_sen

    # y = 2x, except one wild outlier at x=6
    rows = [("g", x, 2 * x) for x in range(6)] + [("g", 6, 1000)]
    df = spark.createDataFrame(rows, ["g", "x", "y"]).repartition(3)
    [row] = theil_sen(df, ["g"], "x", "y").collect()
    assert row["slope"] == pytest.approx(2.0)
    assert row["n_pairs"] == 21
    # OLS on the same data is dragged far from 2
    [ols] = grouped_linreg(df, ["g"], "x", "y").collect()
    assert abs(ols["slope"] - 2.0) > 10


def test_theil_sen_lower_median(spark):
    from pangool_spark.operators.stats import theil_sen

    # slopes for points (0,0),(1,1),(2,4): 1, 2, 3 -> median 2 (odd count);
    # add (3,4): slopes 1,2,3,4/3,3/2,0 -> sorted [0,1,4/3,3/2,2,3],
    # lower median = element 3 of 6 = 4/3
    df = spark.createDataFrame(
        [("g", 0, 0), ("g", 1, 1), ("g", 2, 4), ("g", 3, 4)], ["g", "x", "y"]
    )
    [row] = theil_sen(df, ["g"], "x", "y").collect()
    assert row["n_pairs"] == 6
    assert row["slope"] == pytest.approx(4 / 3)


def test_theil_sen_skips_equal_x(spark):
    from pangool_spark.operators.stats import theil_sen

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 1, 9), ("g", 2, 3)], ["g", "x", "y"]
    )
    [row] = theil_sen(df, ["g"], "x", "y").collect()
    # pairs: (1,1)-(2,3) slope 2 and (1,9)-(2,3) slope -6; equal-x skipped
    assert row["n_pairs"] == 2
    assert row["slope"] == pytest.approx(-6.0)  # lower median of [-6, 2]


def test_theil_sen_cap_bounds_pairs(spark):
    from pangool_spark.operators.stats import theil_sen

    rows = [("g", x, x) for x in range(50)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    [row] = theil_sen(df, ["g"], "x", "y", max_n=10).collect()
    assert row["n_pairs"] == 45  # 10 choose 2, not 50 choose 2
    assert row["slope"] == pytest.approx(1.0)


def test_theil_sen_rejects_fractional(spark):
    from pangool_spark.operators.stats import theil_sen

    df = spark.createDataFrame([("g", 1.0, 2)], ["g", "x", "y"])
    with pytest.raises(ValueError, match="integer-typed"):
        theil_sen(df, ["g"], "x", "y")
