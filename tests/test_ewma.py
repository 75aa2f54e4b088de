"""ewma: per-key exponentially weighted moving average (fold-sorted)."""

import math
import random

from pangool_spark.operators.windows import ewma


def _py_ewma(values, alpha):
    acc = values[0]
    for x in values[1:]:
        acc = alpha * x + (1.0 - alpha) * acc
    return acc


def test_ewma_matches_python_recursion(spark):
    rng = random.Random(7)
    rows = []
    expect = {}
    for k in range(5):
        vals = [round(rng.uniform(-50, 50), 2) for _ in range(rng.randint(1, 30))]
        expect[k] = _py_ewma(vals, 0.3)
        for i, v in enumerate(vals):
            rows.append((k, i, v))
    df = spark.createDataFrame(rows, "k int, t int, v double")
    got = {
        r.k: (r.n_obs, r.ewma)
        for r in ewma(df, ["k"], ["t"], "v", alpha=0.3).collect()
    }
    for k, e in expect.items():
        n, val = got[k]
        assert val == e, f"key {k}: {val} != {e} (bit-exact fold contract)"


def test_ewma_single_observation_is_identity(spark):
    df = spark.createDataFrame([(1, 0, 42.5)], "k int, t int, v double")
    [r] = ewma(df, ["k"], ["t"], "v", alpha=0.9).collect()
    assert (r.n_obs, r.ewma) == (1, 42.5)


def test_ewma_order_matters_and_is_respected(spark):
    # same multiset, shuffled insertion order: fold must follow t
    vals = [(0, 10.0), (1, 20.0), (2, 40.0)]
    for perm in ([0, 1, 2], [2, 0, 1], [1, 2, 0]):
        df = spark.createDataFrame(
            [(1, vals[i][0], vals[i][1]) for i in perm], "k int, t int, v double"
        )
        [r] = ewma(df, ["k"], ["t"], "v", alpha=0.5).collect()
        assert r.ewma == 0.5 * 40.0 + 0.5 * (0.5 * 20.0 + 0.5 * 10.0)
