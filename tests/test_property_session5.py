"""Hypothesis property pins for the round-10 session-5 algebra:
spearman_corr, classification_report, cmh_test, eb_rate_shrinkage —
each against a pure-python reference on randomized inputs, plus the
invariances that define the statistics (monotone-transform invariance
for Spearman, convex-combination bounds for EB shrinkage)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from test_session5_eval import _ref_report, _ref_spearman
from test_session5_cmh_ratio import _ref_cmh

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=3,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_spearman_matches_reference_and_monotone_invariance(spark, data):
    from pangool_spark.operators.stats import spearman_corr

    xs = [x for x, _ in data]
    ys = [y for _, y in data]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in data], "g string, x bigint, y bigint"
    )
    got = spearman_corr(df, ["g"], "x", "y").collect()[0]
    ref = _ref_spearman(xs, ys)
    if ref is None:
        assert got.rho is None
    else:
        assert got.rho == pytest.approx(ref, abs=1e-9)
        # Spearman is invariant under strictly monotone transforms:
        # x -> x^3 preserves order on all ints
        df2 = spark.createDataFrame(
            [("g", x * x * x, y) for x, y in data],
            "g string, x bigint, y bigint",
        )
        got2 = spearman_corr(df2, ["g"], "x", "y").collect()[0]
        assert got2.rho == pytest.approx(got.rho, abs=1e-9)


@given(
    pairs=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.sampled_from(["a", "b", "c", "d"]),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_classification_report_matches_reference_random(spark, pairs):
    from pangool_spark.operators.ml import classification_report

    df = spark.createDataFrame(pairs, "label string, pred string")
    got = {
        r["class"]: r
        for r in classification_report(df, "label", "pred").collect()
    }
    ref, acc, macro, mcc = _ref_report(pairs)
    assert set(got) == set(ref)
    for cls, (tp, fp, fn, sup, prec, rec, f1) in ref.items():
        r = got[cls]
        assert (r.tp, r.fp, r.fn, r.support) == (tp, fp, fn, sup)
        assert r.precision == pytest.approx(prec, abs=1e-12)
        assert r.recall == pytest.approx(rec, abs=1e-12)
        assert r.f1 == pytest.approx(f1, abs=1e-12)
        assert r.accuracy == pytest.approx(acc, abs=1e-12)
        assert r.macro_f1 == pytest.approx(macro, abs=1e-9)
        if mcc is None:
            assert r.mcc is None
        else:
            assert r.mcc == pytest.approx(mcc, abs=1e-12)


@given(
    strata=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda s: sum(s) > 0),
        min_size=1,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_cmh_matches_reference_random(spark, strata):
    from pangool_spark.operators.stats import cmh_test
    from test_session5_cmh_ratio import _cmh_rows

    got = cmh_test(_cmh_rows(spark, strata), "s", "arm", "outc").collect()[0]
    exp_e, exp_chi2, exp_or = _ref_cmh(strata)
    assert got.expected_pos == pytest.approx(exp_e, abs=1e-9)
    if exp_chi2 is None:
        assert got.chi2 is None
    else:
        assert got.chi2 == pytest.approx(exp_chi2, rel=1e-9, abs=1e-9)
    if exp_or is None:
        assert got.or_mh is None
    else:
        assert got.or_mh == pytest.approx(exp_or, rel=1e-9)


@given(
    keys=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=1, max_value=20),
        ).filter(lambda kn: kn[0] <= kn[1]),
        min_size=3,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_eb_shrunk_is_convex_combination(spark, keys):
    from pangool_spark.operators.stats import eb_rate_shrinkage

    rows = [(f"k{i}", k, n) for i, (k, n) in enumerate(keys)]
    df = spark.createDataFrame(rows, "key string, k bigint, n bigint")
    out = eb_rate_shrinkage(df, ["key"], "k", "n").collect()
    for r in out:
        if r.alpha is None:
            continue
        # posterior mean = convex combination of raw rate and the prior
        # mean alpha/(alpha+beta): always strictly between them (or
        # equal when they coincide)
        prior = r.alpha / (r.alpha + r.beta)
        lo, hi = min(r.rate, prior), max(r.rate, prior)
        assert lo - 1e-12 <= r.shrunk <= hi + 1e-12
        # and pulled TOWARD the prior: never past the raw rate
        assert abs(r.shrunk - prior) <= abs(r.rate - prior) + 1e-12
