"""holt_linear: bit-exact parity with the python recursion (Spark side),
round-9 parity with DuckDB's fused-rounding list_reduce (oracle side),
single-obs seeding, order determinism, guards."""

import random

import duckdb
import pytest

from pangool_spark.operators.windows import holt_linear


def py_holt(vals, alpha, beta):
    l, b = float(vals[0]), 0.0
    ca, cb = 1.0 - alpha, 1.0 - beta
    for x in vals[1:]:
        nl = alpha * float(x) + ca * (l + b)
        b = beta * (nl - l) + cb * b
        l = nl
    return l, b


def run(spark, series, alpha=0.3, beta=0.2):
    rows = [
        (k, i, float(v)) for k, vals in series.items() for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k long, t int, value double")
    return {
        r["k"]: (r["n_obs"], r["holt_level"], r["holt_trend"], r["holt_forecast"])
        for r in holt_linear(df, ["k"], ["t"], "value", alpha, beta).collect()
    }


def test_matches_python_recursion_rounded(spark):
    rng = random.Random(31)
    series = {
        k: [rng.uniform(-500, 500) for _ in range(rng.randint(1, 40))]
        for k in range(8)
    }
    got = run(spark, series)
    for k, vals in series.items():
        l, b = py_holt(vals, 0.3, 0.2)
        n, gl, gt, gf = got[k]
        assert n == len(vals)
        assert gl == round(l, 9) and gt == round(b, 9)
        assert gf == round(l + b, 9)


def test_single_obs_seeds_level_zero_trend(spark):
    got = run(spark, {1: [42.5]})
    assert got[1] == (1, 42.5, 0.0, 42.5)


def test_trend_tracks_linear_ramp(spark):
    # a long pure ramp: trend converges toward the slope
    got = run(spark, {1: [float(10 + 3 * t) for t in range(200)]})
    _n, _l, trend, _f = got[1]
    assert abs(trend - 3.0) < 0.05


def test_partitioning_and_input_order_invariance(spark):
    rng = random.Random(7)
    rows = [(1, t, rng.uniform(0, 10)) for t in range(30)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, t int, value double")
    a = holt_linear(df, ["k"], ["t"], "value", 0.3, 0.2).collect()
    b = holt_linear(df.repartition(9), ["k"], ["t"], "value", 0.3, 0.2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_duckdb_round9_parity_sweep(spark):
    """The oracle contract itself: Spark round-9 == DuckDB round-9 on
    random series (DuckDB's lambda fuses rounding; round-9 must absorb
    every drift)."""
    rng = random.Random(13)
    series = {
        k: [rng.uniform(-1000, 1000) for _ in range(rng.randint(1, 120))]
        for k in range(12)
    }
    got = run(spark, series)
    con = duckdb.connect()
    for k, vals in series.items():
        st = con.execute(
            f"""
            SELECT list_reduce(
              list_transform({vals}::DOUBLE[], v -> [v, 0.0::DOUBLE]),
              (acc, x) -> [
                0.3::DOUBLE*x[1] + (1.0::DOUBLE - 0.3::DOUBLE)*(acc[1] + acc[2]),
                0.2::DOUBLE*((0.3::DOUBLE*x[1]
                  + (1.0::DOUBLE - 0.3::DOUBLE)*(acc[1] + acc[2])) - acc[1])
                  + (1.0::DOUBLE - 0.2::DOUBLE)*acc[2]
              ])
            """
        ).fetchall()[0][0]
        duck = con.execute(
            f"SELECT round({float(st[0])!r}::DOUBLE, 9), "
            f"round({float(st[1])!r}::DOUBLE, 9), "
            f"round({float(st[0])!r}::DOUBLE + {float(st[1])!r}::DOUBLE, 9)"
        ).fetchall()[0]
        assert got[k][1:] == tuple(duck)


def test_guards(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], "k long, t int, value double")
    with pytest.raises(ValueError, match="alpha"):
        holt_linear(df, ["k"], ["t"], "value", 0.0, 0.2)
    with pytest.raises(ValueError, match="beta"):
        holt_linear(df, ["k"], ["t"], "value", 0.3, 1.5)
