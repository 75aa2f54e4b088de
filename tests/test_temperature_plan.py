"""temperature_plan: tau limits (1 → natural shares, 0 → uniform),
low-resource boost monotonicity, budget accounting, and guards."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.sampling import temperature_plan


def _df(spark):
    rows = []
    for src, n, tok in [("big", 100, 80_000), ("mid", 50, 15_000), ("small", 10, 5_000)]:
        rows += [(src, tok // n)] * n
    return spark.createDataFrame(rows, "source string, n_tokens bigint")


def test_tau_one_is_natural_proportions(spark):
    got = {r["source"]: r for r in temperature_plan(_df(spark), "source", "n_tokens", 1.0, 100_000).collect()}
    total = sum(r["avail_tokens"] for r in got.values())
    for src, r in got.items():
        assert r["weight"] == pytest.approx(r["avail_tokens"] / total, abs=1e-9)


def test_tau_zero_is_uniform(spark):
    got = {r["source"]: r for r in temperature_plan(_df(spark), "source", "n_tokens", 0.0, 90_000).collect()}
    for r in got.values():
        assert r["weight"] == pytest.approx(1 / 3, abs=1e-9)
        assert r["desired_tokens"] == 29999  # floor(90000 * 0.333333333)


def test_intermediate_tau_boosts_low_resource(spark):
    nat = {r["source"]: r["weight"] for r in temperature_plan(_df(spark), "source", "n_tokens", 1.0, 100_000).collect()}
    tau = {r["source"]: r["weight"] for r in temperature_plan(_df(spark), "source", "n_tokens", 0.7, 100_000).collect()}
    assert tau["small"] > nat["small"] and tau["big"] < nat["big"]
    assert sum(tau.values()) == pytest.approx(1.0, abs=1e-8)


def test_budget_accounting_and_deficit(spark):
    # tiny source can't fill a uniform slice of a huge budget
    got = {r["source"]: r for r in temperature_plan(_df(spark), "source", "n_tokens", 0.0, 3_000_000).collect()}
    small = got["small"]
    assert small["desired_tokens"] > small["avail_tokens"]
    assert small["planned_tokens"] == small["avail_tokens"]
    assert small["deficit_tokens"] == small["desired_tokens"] - small["avail_tokens"]
    assert small["rate"] == 1.0
    assert got["big"]["rate"] <= 1.0


def test_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        temperature_plan(df, "source", "n_tokens", 0.7, 0)
    with pytest.raises(ValueError):
        temperature_plan(df, "source", "n_tokens", -0.1, 10)
