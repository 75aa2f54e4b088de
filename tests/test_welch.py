"""welch_ttest vs an independent pure-Python Welch computation, plus the
degenerate-group guards (tiny arms, zero variance, stray arm labels)."""

import math
import random

import pytest

from pangool_spark.operators.stats import welch_ttest


def _ref_welch(xs_a, xs_b):
    na, nb = len(xs_a), len(xs_b)
    ma, mb = sum(xs_a) / na, sum(xs_b) / nb
    va = sum((x - ma) ** 2 for x in xs_a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in xs_b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    return ma, mb, t, df


def test_welch_matches_python_reference(spark):
    rng = random.Random(11)
    rows = []
    arms = {}
    for g in range(4):
        a = [rng.randint(0, 2000) for _ in range(30 + g)]
        b = [rng.randint(100, 2400) for _ in range(25 + g)]
        arms[g] = (a, b)
        rows += [(g, "a", x) for x in a] + [(g, "b", x) for x in b]
    # stray arm label + NULL metric rows must be ignored
    rows += [(0, "c", 10**9), (1, "a", None)]
    df = spark.createDataFrame(rows, "g int, arm string, x int")
    got = {
        r["g"]: r
        for r in welch_ttest(df, ["g"], "arm", "x", "a", "b").collect()
    }
    assert set(got) == set(arms)
    for g, (a, b) in arms.items():
        ma, mb, t, dfw = _ref_welch(a, b)
        r = got[g]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["mean_a"] == pytest.approx(ma, rel=1e-12)
        assert r["mean_b"] == pytest.approx(mb, rel=1e-12)
        assert r["t_stat"] == pytest.approx(t, rel=1e-9)
        assert r["df_w"] == pytest.approx(dfw, rel=1e-9)


def test_welch_degenerate_groups_emit_null(spark):
    rows = [
        # arm a has a single row -> no test
        (0, "a", 5), (0, "b", 1), (0, "b", 2), (0, "b", 9),
        # both arms constant -> se2 == 0 -> no test (means still emitted)
        (1, "a", 7), (1, "a", 7), (1, "b", 3), (1, "b", 3),
        # group with only one arm present
        (2, "a", 1), (2, "a", 4),
    ]
    df = spark.createDataFrame(rows, "g int, arm string, x int")
    got = {
        r["g"]: r
        for r in welch_ttest(df, ["g"], "arm", "x", "a", "b").collect()
    }
    assert got[0]["t_stat"] is None and got[0]["df_w"] is None
    assert got[1]["t_stat"] is None
    assert got[1]["mean_a"] == 7.0 and got[1]["mean_b"] == 3.0
    assert got[2]["n_b"] == 0
    assert got[2]["mean_b"] is None and got[2]["t_stat"] is None


def test_welch_argument_guards(spark):
    df = spark.createDataFrame([(1, "a", 1.5)], "g int, arm string, x double")
    with pytest.raises(ValueError, match="group column"):
        welch_ttest(df, [], "arm", "x", "a", "b")
    with pytest.raises(ValueError, match="differ"):
        welch_ttest(df, ["g"], "arm", "x", "a", "a")
    with pytest.raises(ValueError, match="missing column"):
        welch_ttest(df, ["g"], "nope", "x", "a", "b")
    # fractional metric takes the decimal path and still runs
    [r] = welch_ttest(
        df.union(df).union(df), ["g"], "arm", "x", "a", "b"
    ).collect()
    assert r["mean_a"] == pytest.approx(1.5)
