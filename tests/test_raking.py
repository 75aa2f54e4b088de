"""raking_weights vs a pure-Python quantized-IPF replica, the margin-
convergence property (last-fitted dimension matches its targets), and
parameter guards."""

import pytest

from pangool_spark.operators.stats import raking_weights

Q = 1_000_000


def _py_rake(cells, row_t, col_t, iters):
    wq = {k: Q for k in cells}
    for _ in range(iters):
        for dim, tgt in ((0, row_t), (1, col_t)):
            margins = {}
            for k, n in cells.items():
                margins[k[dim]] = margins.get(k[dim], 0) + n * wq[k]
            for k in cells:
                m = margins[k[dim]]
                if m > 0:
                    ratio = tgt.get(k[dim], 0.0) / (float(m) / float(Q))
                    # floor(x+0.5): Spark/DuckDB HALF_UP, not banker's
                    import math

                    wq[k] = int(math.floor(float(wq[k]) * ratio + 0.5))
                else:
                    wq[k] = 0
    return {k: wq[k] / Q for k in cells}


def test_raking_matches_python_replica_and_converges(spark):
    cells = {
        ("x", "u"): 50,
        ("x", "v"): 150,
        ("y", "u"): 200,
        ("y", "v"): 100,
    }
    rows = [(a, b) for (a, b), n in cells.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "a string, b string")
    row_t = {"x": 250.0, "y": 250.0}
    col_t = {"u": 300.0, "v": 200.0}
    got = {
        (r["a"], r["b"]): r
        for r in raking_weights(df, "a", "b", row_t, col_t, iters=3).collect()
    }
    ref = _py_rake(cells, row_t, col_t, 3)
    for k, n in cells.items():
        assert got[k]["n"] == n
        assert got[k]["weight"] == pytest.approx(ref[k], abs=0.0)
    # column pass runs last: fitted column margins match their targets
    # to quantization resolution
    for b, t in col_t.items():
        fitted = sum(r["fitted"] for k, r in got.items() if k[1] == b)
        assert fitted == pytest.approx(t, abs=1e-2)
    # row margins converge toward (not exactly onto) their targets
    for a, t in row_t.items():
        fitted = sum(r["fitted"] for k, r in got.items() if k[0] == a)
        assert fitted == pytest.approx(t, rel=0.05)


def test_raking_missing_target_collapses_to_zero(spark):
    df = spark.createDataFrame(
        [("x", "u")] * 5 + [("z", "u")] * 5, "a string, b string"
    )
    got = {
        (r["a"], r["b"]): r
        for r in raking_weights(
            df, "a", "b", {"x": 10.0}, {"u": 10.0}, iters=2
        ).collect()
    }
    assert got[("z", "u")]["weight"] == 0.0
    assert got[("x", "u")]["weight"] > 0.0


def test_raking_guards(spark):
    df = spark.createDataFrame([("x", "u")], "a string, b string")
    with pytest.raises(ValueError):
        raking_weights(df, "a", "b", {}, {"u": 1.0})
    with pytest.raises(ValueError):
        raking_weights(df, "a", "b", {"x": 1.0}, {"u": 1.0}, iters=0)
    with pytest.raises(ValueError):
        raking_weights(df, "a", "b", {"x": 1.0}, {"u": 1.0}, quantum=0)
