"""Round-10 session-5 causal/forecast operators: ipw_ate,
quantile_treatment_effects, forecast_accuracy — pure-python reference
pins plus the documented edge contracts."""

import datetime

import pytest


def test_ipw_ate_matches_stratified_reference(spark):
    from pangool_spark.operators.stats import ipw_ate

    rows = [
        # stratum s1: treat mean 30, control mean 10
        ("s1", True, 20), ("s1", True, 40), ("s1", False, 10),
        # stratum s2: treat mean 5, control mean 25
        ("s2", True, 5), ("s2", False, 20), ("s2", False, 30),
        # stratum s3: control only — excluded from the estimate
        ("s3", False, 100), ("s3", False, 200),
        # NULL rows dropped
        (None, True, 1), ("s1", None, 1), ("s1", True, None),
    ]
    df = spark.createDataFrame(rows, "s string, tr boolean, y bigint")
    got = {r.stratum: r for r in ipw_ate(df, "s", "tr", "y").collect()}
    assert set(got) == {"s1", "s2", "s3"}
    # reference: N_used = 3 + 3; ATE = (3*(30-10) + 3*(5-25)) / 6 = 0
    q1 = round(3 * (30.0 - 10.0) * 1e6)
    q2 = round(3 * (5.0 - 25.0) * 1e6)
    ref_ate = (q1 + q2) / 1e6 / 6
    for r in got.values():
        assert r.ate == pytest.approx(ref_ate, abs=1e-9)
    assert got["s1"].diff == pytest.approx(20.0)
    assert got["s1"].weight == pytest.approx(0.5)
    assert got["s3"].diff is None and got["s3"].weight is None
    assert got["s3"].mean_t is None
    assert got["s3"].mean_c == pytest.approx(150.0)


def test_ipw_ate_requires_integer_outcome(spark):
    from pangool_spark.operators.stats import ipw_ate

    df = spark.createDataFrame([("s", True, 1.0)], "s string, tr boolean, y double")
    with pytest.raises(ValueError, match="integer outcome"):
        ipw_ate(df, "s", "tr", "y")


def test_qte_matches_numpy_interpolation(spark):
    import numpy as np

    from pangool_spark.operators.stats import quantile_treatment_effects

    t_vals = [3, 1, 4, 1, 5, 9, 2, 6]
    c_vals = [2, 7, 1, 8, 2, 8]
    rows = [(True, v) for v in t_vals] + [(False, v) for v in c_vals]
    df = spark.createDataFrame(rows, "tr boolean, y bigint")
    probs = (0.1, 0.5, 0.9)
    got = {
        r.p: r
        for r in quantile_treatment_effects(df, "tr", "y", probs).collect()
    }
    assert set(got) == set(probs)
    for p in probs:
        qt = float(np.quantile(np.array(t_vals, dtype=float), p))
        qc = float(np.quantile(np.array(c_vals, dtype=float), p))
        r = got[p]
        assert (r.n_t, r.n_c) == (len(t_vals), len(c_vals))
        assert r.q_t == pytest.approx(qt, abs=1e-12)
        assert r.q_c == pytest.approx(qc, abs=1e-12)
        assert r.qte == pytest.approx(qt - qc, abs=1e-12)


def test_qte_empty_arm_yields_empty_relation(spark):
    from pangool_spark.operators.stats import quantile_treatment_effects

    df = spark.createDataFrame([(True, 1), (True, 2)], "tr boolean, y bigint")
    assert quantile_treatment_effects(df, "tr", "y", (0.5,)).count() == 0


def test_qte_validates_inputs(spark):
    from pangool_spark.operators.stats import quantile_treatment_effects

    df = spark.createDataFrame([(True, 1.0)], "tr boolean, y double")
    with pytest.raises(ValueError, match="integer-typed"):
        quantile_treatment_effects(df, "tr", "y")
    df2 = spark.createDataFrame([(True, 1)], "tr boolean, y bigint")
    with pytest.raises(ValueError, match="probabilities"):
        quantile_treatment_effects(df2, "tr", "y", ())


def _daily(spark, series):
    """series: {key: [v0, v1, ...]} daily values starting 2024-01-01."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (k, base + datetime.timedelta(days=i), v)
        for k, vs in series.items()
        for i, v in enumerate(vs)
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v bigint")


def test_forecast_accuracy_matches_reference(spark):
    from pangool_spark.operators.stats import forecast_accuracy

    vs = [10, 12, 9, 14, 11, 13, 10, 11, 13, 8, 15, 10, 14, 9]
    df = _daily(spark, {"a": vs})
    got = forecast_accuracy(df, ["k"], "ts", "v", season_days=7).collect()[0]
    season_pairs = [(vs[i], vs[i - 7]) for i in range(7, len(vs))]
    one_pairs = [(vs[i], vs[i - 1]) for i in range(1, len(vs))]
    saes = sum(abs(a - b) for a, b in season_pairs)
    say = sum(abs(a) for a, _ in season_pairs)
    sae1 = sum(abs(a - b) for a, b in one_pairs)
    qsm = sum(
        round(2.0 * abs(a - b) / (abs(a) + abs(b)) * 1e9)
        for a, b in season_pairs
    )
    n = len(season_pairs)
    assert got.n_days == n
    assert got.mase == pytest.approx(
        (saes / n) / (sae1 / len(one_pairs)), rel=1e-12
    )
    assert got.smape == pytest.approx(qsm / 1e9 / n, rel=1e-9)
    assert got.wape == pytest.approx(saes / say, rel=1e-12)


def test_forecast_accuracy_constant_series_null_mase(spark):
    from pangool_spark.operators.stats import forecast_accuracy

    # constant series: naive-1 MAE = 0 → MASE undefined, sMAPE/WAPE = 0
    df = _daily(spark, {"a": [5] * 10})
    got = forecast_accuracy(df, ["k"], "ts", "v", season_days=7).collect()[0]
    assert got.mase is None
    assert got.smape == 0.0
    assert got.wape == 0.0


def test_forecast_accuracy_short_series_absent_and_validation(spark):
    from pangool_spark.operators.stats import forecast_accuracy

    df = _daily(spark, {"a": [1, 2, 3]})  # no lag-7 pair
    assert forecast_accuracy(df, ["k"], "ts", "v", season_days=7).count() == 0
    with pytest.raises(ValueError, match="season_days"):
        forecast_accuracy(df, ["k"], "ts", "v", season_days=1)
    dbl = spark.createDataFrame(
        [("a", datetime.datetime(2024, 1, 1), 1.0)],
        "k string, ts timestamp, v double",
    )
    with pytest.raises(ValueError, match="integer-typed"):
        forecast_accuracy(dbl, ["k"], "ts", "v")


def test_ipw_ate_no_usable_stratum_yields_null(spark):
    from pangool_spark.operators.stats import ipw_ate

    # every stratum single-armed: the estimate is undefined, not a /0
    rows = [("s1", True, 10), ("s2", False, 20)]
    df = spark.createDataFrame(rows, "s string, tr boolean, y bigint")
    for r in ipw_ate(df, "s", "tr", "y").collect():
        assert r.ate is None and r.diff is None


def test_forecast_accuracy_null_group_key_preserved(spark):
    """NULL group keys are regular GROUP BY values; the lag self-joins
    must reassemble them too (round-11 advisor: plain `=` joins dropped
    NULL-keyed groups). NULL-keyed series must score identically to a
    named twin."""
    from pangool_spark.operators.stats import forecast_accuracy

    vs = [10, 12, 9, 14, 11, 13, 10, 11, 13, 8, 15, 10, 14, 9]
    df = _daily(spark, {"a": vs, None: vs})
    got = {
        r.k: r
        for r in forecast_accuracy(
            df, ["k"], "ts", "v", season_days=7
        ).collect()
    }
    assert set(got) == {"a", None}
    assert got[None].n_days == got["a"].n_days
    assert got[None].mase == pytest.approx(got["a"].mase, rel=1e-12)
    assert got[None].smape == pytest.approx(got["a"].smape, rel=1e-12)
    assert got[None].wape == pytest.approx(got["a"].wape, rel=1e-12)
