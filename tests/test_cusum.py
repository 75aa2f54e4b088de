"""cusum (Lindley-identity window form) vs the literal
s = max(0, s + d) recursion computed in python."""

import random
from collections import defaultdict

import pytest

from pangool_spark.operators.stats import cusum


def _brute(rows, target, slack, h):
    by_k = defaultdict(list)
    for k, t, x in rows:
        if k is not None and x is not None:
            by_k[k].append((t, x))
    want = set()
    for k, obs in by_k.items():
        obs.sort()
        s_hi = s_lo = 0
        for t, x in obs:
            s_hi = max(0, s_hi + (x - (target + slack)))
            s_lo = max(0, s_lo + ((target - slack) - x))
            want.add((k, t, x, s_hi, s_lo, s_hi > h or s_lo > h))
    return want


def test_cusum_matches_recursion(spark):
    rng = random.Random(41)
    rows = []
    for k in range(6):
        drift = rng.choice([-30, 0, 25])
        rows += [
            (k, t, 100 + drift * (t > 40) + rng.randint(-40, 40))
            for t in range(90)
        ]
    rows += [(None, 0, 5), (2, 91, None)]
    df = spark.createDataFrame(rows, "k int, t int, x int")
    got = {
        (r["k"], r["t"], r["value"], r["cusum_hi"], r["cusum_lo"], r["alarm"])
        for r in cusum(df, ["k"], ["t"], "x", 100, 10, 120).collect()
    }
    want = _brute(rows, 100, 10, 120)
    assert got == want
    # the drifted keys must actually alarm, the centered ones not always
    assert any(a for (_, _, _, _, _, a) in want)


def test_cusum_guards(spark):
    df = spark.createDataFrame([(1, 1, 1.5)], "k int, t int, x double")
    with pytest.raises(ValueError, match="integer-typed"):
        cusum(df, ["k"], ["t"], "x", 0, 0, 1)
    dfi = spark.createDataFrame([(1, 1, 1)], "k int, t int, x int")
    with pytest.raises(ValueError, match="key and order"):
        cusum(dfi, [], ["t"], "x", 0, 0, 1)
    with pytest.raises(ValueError, match="slack"):
        cusum(dfi, ["k"], ["t"], "x", 0, -1, 1)
