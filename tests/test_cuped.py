"""cuped vs a pure-Python CUPED reference: theta/rho2/adjusted means,
the correlated-covariate variance-reduction property, degenerate
covariate, and integer-contract guards."""

import random

import pytest

from pangool_spark.operators.stats import cuped


def _ref(units):
    xs = [x for _, x, _ in units]
    ys = [y for _, _, y in units]
    n = len(units)
    xb, yb = sum(xs) / n, sum(ys) / n
    cov = sum(a * b for a, b in zip(xs, ys)) / n - xb * yb
    vx = sum(a * a for a in xs) / n - xb * xb
    vy = sum(b * b for b in ys) / n - yb * yb
    theta = cov / vx
    out = {}
    for arm in set(a for a, _, _ in units):
        arm_rows = [(x, y) for a, x, y in units if a == arm]
        axb = sum(x for x, _ in arm_rows) / len(arm_rows)
        ayb = sum(y for _, y in arm_rows) / len(arm_rows)
        out[arm] = ayb - theta * (axb - xb)
    return theta, cov * cov / (vx * vy), out


def test_cuped_matches_python_reference(spark):
    rng = random.Random(31)
    units = []
    for i in range(800):
        x = rng.randint(0, 10_000)
        lift = 500 if i % 2 else 0
        y = x + rng.randint(-1000, 1000) + lift  # y correlated with x
        units.append((i % 2, x, y))
    df = spark.createDataFrame(units, "arm int, x bigint, y bigint")
    got = {r["arm"]: r for r in cuped(df, "arm", "y", "x").collect()}
    theta, rho2, adj = _ref(units)
    for arm in (0, 1):
        assert got[arm]["theta"] == pytest.approx(theta, rel=1e-12)
        assert got[arm]["rho2"] == pytest.approx(rho2, rel=1e-12)
        assert got[arm]["y_adj"] == pytest.approx(adj[arm], rel=1e-9)
    # strongly correlated covariate → large variance reduction
    assert got[0]["rho2"] > 0.8
    # the adjusted lift estimate should sit near the true +500
    assert got[1]["y_adj"] - got[0]["y_adj"] == pytest.approx(500, abs=120)


def test_cuped_degenerate_covariate(spark):
    df = spark.createDataFrame(
        [(0, 5, 10), (0, 5, 20), (1, 5, 30)], "arm int, x bigint, y bigint"
    )
    got = cuped(df, "arm", "y", "x").collect()
    for r in got:
        assert r["theta"] is None and r["y_adj"] is None and r["rho2"] is None
        assert r["y_mean"] is not None  # raw means still reported


def test_cuped_rejects_fractional(spark):
    df = spark.createDataFrame([(0, 1.5, 2)], "arm int, x double, y bigint")
    with pytest.raises(ValueError):
        cuped(df, "arm", "y", "x")
