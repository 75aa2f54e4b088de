"""pr_curve + calibration_bins: exact classifier-evaluation relations."""

import pytest


def test_pr_curve_known_points(spark):
    from pangool_spark.operators.stats import pr_curve

    # scores: pos at {9, 7}, neg at {8, 3}
    rows = [("g", 1, 9), ("g", 0, 8), ("g", 1, 7), ("g", 0, 3)]
    df = spark.createDataFrame(rows, "g STRING, y BIGINT, s BIGINT")
    got = {
        r["threshold"]: (r["tp"], r["fp"], r["fn"], r["tn"], r["precision"], r["recall"])
        for r in pr_curve(df, ["g"], "y", "s").collect()
    }
    assert got[9] == (1, 0, 1, 2, 1.0, 0.5)
    assert got[8] == (1, 1, 1, 1, 0.5, 0.5)
    assert got[7] == (2, 1, 0, 1, pytest.approx(2 / 3), 1.0)
    assert got[3] == (2, 2, 0, 0, 0.5, 1.0)


def test_pr_curve_matches_sklearn_style_reference(spark):
    import numpy as np

    from pangool_spark.operators.stats import pr_curve

    rng = np.random.RandomState(2)
    y = rng.randint(0, 2, size=80)
    s = rng.randint(0, 15, size=80)
    df = spark.createDataFrame(
        [("g", int(a), int(b)) for a, b in zip(y, s)],
        "g STRING, y BIGINT, s BIGINT",
    ).repartition(4)
    got = {r["threshold"]: r for r in pr_curve(df, ["g"], "y", "s").collect()}
    for t in sorted(set(s)):
        pred = s >= t
        tp = int((pred & (y == 1)).sum())
        fp = int((pred & (y == 0)).sum())
        r = got[t]
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert r["precision"] == pytest.approx(tp / (tp + fp))
        assert r["recall"] == pytest.approx(tp / (y == 1).sum())


def test_calibration_bins_rates(spark):
    from pangool_spark.operators.stats import calibration_bins

    # bin 0 (scores 0-9): 1 of 2 positive; bin 1 (10-19): 2 of 2
    rows = [("g", 1, 5), ("g", 0, 9), ("g", 1, 12), ("g", 1, 19)]
    df = spark.createDataFrame(rows, "g STRING, y BIGINT, s BIGINT")
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["pos_rate"], r["mean_score"])
        for r in calibration_bins(df, ["g"], "y", "s", bin_width=10).collect()
    }
    assert got[0] == (2, 1, 0.5, 7.0)
    assert got[1] == (2, 2, 1.0, 15.5)


def test_calibration_guards(spark):
    from pangool_spark.operators.stats import calibration_bins, pr_curve

    df = spark.createDataFrame([("g", 1, 0.5)], "g STRING, y BIGINT, s DOUBLE")
    with pytest.raises(ValueError, match="integer-typed"):
        pr_curve(df, ["g"], "y", "s")
    with pytest.raises(ValueError, match="bin_width"):
        calibration_bins(
            spark.createDataFrame([("g", 1, 1)], "g STRING, y BIGINT, s BIGINT"),
            ["g"], "y", "s", bin_width=0,
        )
