"""Round-10 session-2 batch 2: chi-squared independence, Cohen's kappa,
mixture planning, quantile normalization — semantics pinned against
hand-computed (or pure-python recomputed) references."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# chi_squared_independence


def _py_chi2(rows):
    """Reference chi2 from (a, b) tuples, pure python."""
    from collections import Counter

    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = 0.0
    for (a, b), o in cells.items():
        e = ra[a] * cb[b] / n
        chi2 += (o - e) ** 2 / e
    return chi2


def test_chisq_matches_pure_python(spark):
    from pangool_spark.operators.stats import chi_squared_independence

    rows = [(i % 3, (i * 7 + i // 5) % 4) for i in range(600)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    r = chi_squared_independence(df, "a", "b").first()
    assert r["n"] == 600
    assert r["n_a"] == 3 and r["n_b"] == 4
    assert r["dof"] == 6
    assert r["chi2"] == pytest.approx(_py_chi2(rows), abs=2e-5)
    assert r["cramers_v"] == pytest.approx(
        (r["chi2"] / (600 * 2)) ** 0.5, rel=1e-12
    )


def test_chisq_independent_vs_dependent(spark):
    from pangool_spark.operators.stats import chi_squared_independence

    # perfectly dependent: b == a -> V == 1
    dep = spark.createDataFrame(
        [(i % 4, i % 4) for i in range(400)], "a LONG, b LONG"
    )
    assert chi_squared_independence(dep, "a", "b").first()[
        "cramers_v"
    ] == pytest.approx(1.0, abs=1e-9)
    # exactly balanced independent layout -> chi2 == 0
    ind = spark.createDataFrame(
        [(i % 2, (i // 2) % 2) for i in range(400)], "a LONG, b LONG"
    )
    assert chi_squared_independence(ind, "a", "b").first()[
        "chi2"
    ] == pytest.approx(0.0, abs=1e-6)


def test_chisq_null_is_its_own_class(spark):
    from pangool_spark.operators.stats import chi_squared_independence

    df = spark.createDataFrame(
        [(None, 1), (None, 2), (1, 1), (1, 2)], "a INT, b INT"
    )
    r = chi_squared_independence(df, "a", "b").first()
    assert r["n_a"] == 2  # NULL counted as a class
    assert r["n"] == 4


# ---------------------------------------------------------------------------
# cohens_kappa


def test_kappa_hand_computed_2x2(spark):
    from pangool_spark.operators.stats import cohens_kappa

    # classic fixture: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a STRING, b STRING")
    r = cohens_kappa(df, "a", "b").first()
    n = 50
    po = 35 / n
    pe = (25 * 30 + 25 * 20) / n**2
    assert r["n"] == n and r["n_agree"] == 35
    assert r["po"] == pytest.approx(po)
    assert r["pe"] == pytest.approx(pe)
    assert r["kappa"] == pytest.approx((po - pe) / (1 - pe))


def test_kappa_perfect_and_degenerate(spark):
    from pangool_spark.operators.stats import cohens_kappa

    perfect = spark.createDataFrame(
        [(i % 3, i % 3) for i in range(90)], "a LONG, b LONG"
    )
    assert cohens_kappa(perfect, "a", "b").first()["kappa"] == pytest.approx(1.0)
    # both raters constant and equal: pe == 1 -> NULL kappa, not a 0/0
    const = spark.createDataFrame([(1, 1)] * 10, "a LONG, b LONG")
    r = cohens_kappa(const, "a", "b").first()
    assert r["kappa"] is None and r["po"] == 1.0


def test_kappa_counts_null_labels(spark):
    from pangool_spark.operators.stats import cohens_kappa

    df = spark.createDataFrame(
        [(None, None), (None, None), (1, 1), (1, None)], "a INT, b INT"
    )
    r = cohens_kappa(df, "a", "b").first()
    assert r["n_agree"] == 3  # NULL==NULL agreement via null-safe equality


# ---------------------------------------------------------------------------
# quantile_normalize


def test_quantile_normalize_grid(spark):
    from pangool_spark.operators.stats import quantile_normalize

    df = spark.createDataFrame(
        [("g", i, float(100 - i)) for i in range(10)],
        "grp STRING, id LONG, v DOUBLE",
    )
    out = quantile_normalize(df, ["grp"], "v", ["id"]).collect()
    got = sorted((r["v"], r["qnorm"]) for r in out)
    # smallest value -> 1/20, largest -> 19/20: the mid-rank grid
    assert got[0][1] == pytest.approx(0.05)
    assert got[-1][1] == pytest.approx(0.95)
    assert [q for _, q in got] == pytest.approx(
        [(2 * k - 1) / 20 for k in range(1, 11)]
    )


def test_quantile_normalize_tie_determinism(spark):
    from pangool_spark.operators.stats import quantile_normalize

    df = spark.createDataFrame(
        [("g", i, 1.0) for i in range(6)], "grp STRING, id LONG, v DOUBLE"
    )
    a = sorted((r["id"], r["qnorm"]) for r in quantile_normalize(df, ["grp"], "v", ["id"]).collect())
    b = sorted((r["id"], r["qnorm"]) for r in quantile_normalize(df, ["grp"], "v", ["id"]).collect())
    assert a == b
    assert a[0][1] < a[-1][1]  # ties split deterministically by id


def test_quantile_normalize_single_exchange(spark):
    from pangool_spark.operators.stats import quantile_normalize

    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(100)],
        "grp STRING, id LONG, v DOUBLE",
    )
    plan = (
        quantile_normalize(df, ["grp"], "v", ["id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


# ---------------------------------------------------------------------------
# mixture_plan


def test_mixture_plan_hand_computed(spark):
    from pangool_spark.operators.sampling import mixture_plan

    rows = [("a", i, 100) for i in range(10)] + [("b", i, 100) for i in range(2)]
    df = spark.createDataFrame(rows, "src STRING, id LONG, toks LONG")
    out = {
        r["source"]: r
        for r in mixture_plan(
            df, "src", "toks", {"a": 0.5, "b": 0.5}, 1000
        ).collect()
    }
    # a: avail 1000, desired 500 -> rate 0.5, no deficit
    assert out["a"]["avail_tokens"] == 1000
    assert out["a"]["desired_tokens"] == 500
    assert out["a"]["rate"] == pytest.approx(0.5)
    assert out["a"]["deficit_tokens"] == 0
    # b: avail 200, desired 500 -> clamped rate 1.0, deficit 300
    assert out["b"]["planned_tokens"] == 200
    assert out["b"]["rate"] == pytest.approx(1.0)
    assert out["b"]["deficit_tokens"] == 300


def test_mixture_plan_unlisted_source_weight_zero(spark):
    from pangool_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("a", 1, 10), ("ghost", 2, 10)], "src STRING, id LONG, toks LONG"
    )
    out = {
        r["source"]: r
        for r in mixture_plan(df, "src", "toks", {"a": 1.0}, 100).collect()
    }
    assert out["ghost"]["weight"] == 0.0
    assert out["ghost"]["desired_tokens"] == 0
    assert out["ghost"]["avail_tokens"] == 10  # availability still reported


def test_mixture_plan_validates_budget(spark):
    from pangool_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame([("a", 1, 10)], "src STRING, id LONG, toks LONG")
    with pytest.raises(ValueError, match="budget_tokens"):
        mixture_plan(df, "src", "toks", {"a": 1.0}, 0)


# ---------------------------------------------------------------------------
# weighted_median


def test_weighted_median_hand_computed(spark):
    from pangool_spark.operators.stats import weighted_median

    # values 10 (w=1), 20 (w=1), 30 (w=10): half the 12 units sit at 30
    df = spark.createDataFrame(
        [("g", 10, 1, 1), ("g", 20, 1, 2), ("g", 30, 10, 3)],
        "grp STRING, v LONG, w LONG, id LONG",
    )
    r = weighted_median(df, ["grp"], "v", "w", ["id"]).first()
    assert r["total_weight"] == 12
    assert r["median"] == 30
    # unweighted median of the rows would be 20 — the point of the op


def test_weighted_median_equals_plain_median_at_unit_weights(spark):
    from pangool_spark.operators.stats import weighted_median

    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    df = spark.createDataFrame(
        [("g", v, 1, i) for i, v in enumerate(vals)],
        "grp STRING, v LONG, w LONG, id LONG",
    )
    r = weighted_median(df, ["grp"], "v", "w", ["id"]).first()
    # lower weighted median of 8 unit weights = 4th smallest = 3
    assert r["median"] == sorted(vals)[3]


def test_weighted_median_skips_nonpositive_weights(spark):
    from pangool_spark.operators.stats import weighted_median

    df = spark.createDataFrame(
        [("g", 100, 0, 1), ("g", 1, 5, 2), ("g", 200, None, 3)],
        "grp STRING, v LONG, w LONG, id LONG",
    )
    r = weighted_median(df, ["grp"], "v", "w", ["id"]).first()
    assert r["total_weight"] == 5 and r["median"] == 1


def test_weighted_median_validates_types(spark):
    from pangool_spark.operators.stats import weighted_median

    df = spark.createDataFrame(
        [("g", 1.5, 1, 1)], "grp STRING, v DOUBLE, w LONG, id LONG"
    )
    with pytest.raises(ValueError, match="integer value column"):
        weighted_median(df, ["grp"], "v", "w", ["id"])
