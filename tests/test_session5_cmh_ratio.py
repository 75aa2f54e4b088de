"""Round-10 session-5 batch 4: cmh_test and ratio_metric_delta —
pure-python reference pins plus edge contracts."""

import math

import pytest


def _ref_cmh(strata):
    """strata: list of (a, b, c, d)."""
    soe = se = sv = sad = sbc = 0.0
    for a, b, c, d in strata:
        n = a + b + c + d
        if n == 0:
            continue
        e = (a + b) * (a + c) / n
        v = (
            (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
            if n > 1
            else 0.0
        )
        soe += round((a - e) * 1e9) / 1e9
        se += round(e * 1e9) / 1e9
        sv += round(v * 1e9) / 1e9
        sad += round(a * d / n * 1e9) / 1e9
        sbc += round(b * c / n * 1e9) / 1e9
    chi2 = soe * soe / sv if sv > 0 else None
    or_mh = sad / sbc if sbc > 0 else None
    return se, chi2, or_mh


def _cmh_rows(spark, strata):
    rows = []
    for i, (a, b, c, d) in enumerate(strata):
        s = f"s{i}"
        rows += [(s, True, True)] * a + [(s, True, False)] * b
        rows += [(s, False, True)] * c + [(s, False, False)] * d
    return spark.createDataFrame(rows, "s string, arm boolean, outc boolean")


def test_cmh_matches_reference(spark):
    from pangool_spark.operators.stats import cmh_test

    strata = [(12, 8, 7, 13), (5, 15, 9, 11), (20, 4, 18, 6)]
    got = cmh_test(_cmh_rows(spark, strata), "s", "arm", "outc").collect()[0]
    exp_e, exp_chi2, exp_or = _ref_cmh(strata)
    assert got.n_strata == 3
    assert got.n == sum(sum(s) for s in strata)
    assert got.exposed_pos == sum(s[0] for s in strata)
    assert got.expected_pos == pytest.approx(exp_e, abs=1e-9)
    assert got.chi2 == pytest.approx(exp_chi2, rel=1e-9)
    assert got.or_mh == pytest.approx(exp_or, rel=1e-9)


def test_cmh_no_association_when_balanced(spark):
    from pangool_spark.operators.stats import cmh_test

    # identical outcome rates in both arms per stratum → O−E = 0 exactly
    strata = [(10, 10, 10, 10), (4, 16, 4, 16)]
    got = cmh_test(_cmh_rows(spark, strata), "s", "arm", "outc").collect()[0]
    assert got.chi2 == pytest.approx(0.0, abs=1e-9)
    assert got.or_mh == pytest.approx(1.0, rel=1e-9)


def test_cmh_simpsons_paradox_controlled(spark):
    from pangool_spark.operators.stats import cmh_test

    # within every stratum the arm does nothing; the strata differ in
    # both exposure and base rate, so the POOLED 2x2 shows association —
    # the CMH chi2 must stay ~0 where the crude test would fire
    strata = [(90, 10, 9, 1), (1, 9, 10, 90)]
    got = cmh_test(_cmh_rows(spark, strata), "s", "arm", "outc").collect()[0]
    assert got.chi2 == pytest.approx(0.0, abs=1e-6)
    pooled = [
        (
            sum(s[0] for s in strata),
            sum(s[1] for s in strata),
            sum(s[2] for s in strata),
            sum(s[3] for s in strata),
        )
    ]
    _, crude_chi2, _ = _ref_cmh(pooled)
    assert crude_chi2 > 10  # the paradox the stratified test removes


def _ref_delta(units):
    xs = [x for x, _ in units]
    ys = [y for _, y in units]
    n = len(units)
    sx, sy = sum(xs), sum(ys)
    ratio = sx / sy
    var_x = (sum(x * x for x in xs) - sx * sx / n) / (n - 1)
    var_y = (sum(y * y for y in ys) - sy * sy / n) / (n - 1)
    cov = (sum(x * y for x, y in units) - sx * sy / n) / (n - 1)
    ybar = sy / n
    var_r = (var_x - 2.0 * ratio * cov + ratio * ratio * var_y) / (
        n * ybar * ybar
    )
    return ratio, math.sqrt(var_r)


def test_ratio_delta_matches_reference(spark):
    from pangool_spark.operators.stats import ratio_metric_delta

    units = [(120, 10), (40, 8), (0, 5), (300, 20), (60, 6), (90, 12)]
    rows = [("g", f"u{i}", x, y) for i, (x, y) in enumerate(units)]
    df = spark.createDataFrame(rows, "g string, u string, x bigint, y bigint")
    got = ratio_metric_delta(df, ["g"], "u", "x", "y").collect()[0]
    ratio, se = _ref_delta(units)
    assert got.n_units == len(units)
    assert got.ratio == pytest.approx(ratio, rel=1e-12)
    assert got.se == pytest.approx(se, rel=1e-9)
    assert got.ci_lo == pytest.approx(ratio - 1.96 * se, rel=1e-9)
    assert got.ci_hi == pytest.approx(ratio + 1.96 * se, rel=1e-9)


def test_ratio_delta_aggregates_rows_per_unit(spark):
    from pangool_spark.operators.stats import ratio_metric_delta

    # two rows for the same unit must fold into ONE unit total first
    rows = [("g", "u1", 10, 2), ("g", "u1", 30, 3), ("g", "u2", 20, 5)]
    df = spark.createDataFrame(rows, "g string, u string, x bigint, y bigint")
    got = ratio_metric_delta(df, ["g"], "u", "x", "y").collect()[0]
    assert got.n_units == 2
    assert got.ratio == pytest.approx(60 / 10)


def test_ratio_delta_degenerate_groups(spark):
    from pangool_spark.operators.stats import ratio_metric_delta

    rows = [("one", "u1", 5, 2), ("zero", "u1", 5, 0), ("zero", "u2", 3, 0)]
    df = spark.createDataFrame(rows, "g string, u string, x bigint, y bigint")
    got = {r.g: r for r in ratio_metric_delta(df, ["g"], "u", "x", "y").collect()}
    assert got["one"].se is None  # single unit: no variance
    assert got["zero"].ratio is None  # Σy = 0: ratio undefined
    with pytest.raises(ValueError, match="integer-typed"):
        ratio_metric_delta(
            spark.createDataFrame([("g", "u", 1.0, 1)], "g string, u string, x double, y bigint"),
            ["g"], "u", "x", "y",
        )


def test_cmh_and_causal_validate_boolean_columns(spark):
    from pangool_spark.operators.stats import (
        cmh_test,
        ipw_ate,
        quantile_treatment_effects,
    )

    ints = spark.createDataFrame(
        [("s", 1, 1, 5)], "s string, arm int, outc int, y bigint"
    )
    with pytest.raises(ValueError, match="must be boolean"):
        cmh_test(ints, "s", "arm", "outc")
    with pytest.raises(ValueError, match="must be boolean"):
        ipw_ate(ints, "s", "arm", "y")
    with pytest.raises(ValueError, match="must be boolean"):
        quantile_treatment_effects(ints, "arm", "y")
