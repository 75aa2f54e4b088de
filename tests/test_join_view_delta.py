"""join_view_delta == full recompute minus old view, as MULTISETS
(duplicate join keys and duplicate rows on both sides)."""

from collections import Counter

import random

import pytest

from pangool_spark.operators.upsert import join_view_delta


def _counter(df):
    return Counter(tuple(r) for r in df.collect())


def test_delta_equals_recompute_multiset(spark):
    rng = random.Random(5)
    mk_l = lambda n: [
        (rng.randint(0, 12), rng.randint(0, 4)) for _ in range(n)
    ]
    mk_r = lambda n: [
        (rng.randint(0, 12), rng.choice("xyz")) for _ in range(n)
    ]
    lb = spark.createDataFrame(mk_l(60), "k int, lv int")
    ld = spark.createDataFrame(mk_l(25), "k int, lv int")
    rb = spark.createDataFrame(mk_r(40), "rk int, rv string")
    rd = spark.createDataFrame(mk_r(15), "rk int, rv string")

    delta = join_view_delta(lb, ld, rb, rd, "k", "rk")

    full_l, full_r = lb.unionByName(ld), rb.unionByName(rd)
    new_view = full_l.join(full_r, full_l["k"] == full_r["rk"]).select(
        "k", "lv", "rk", "rv"
    )
    old_view = lb.join(rb, lb["k"] == rb["rk"]).select("k", "lv", "rk", "rv")

    want = _counter(new_view)
    want.subtract(_counter(old_view))
    assert _counter(delta) == +want


def test_guards(spark):
    a = spark.createDataFrame([(1, 2)], "k int, v int")
    b = spark.createDataFrame([(1,)], "k int")
    c = spark.createDataFrame([(1, "x")], "rk int, rv string")
    with pytest.raises(ValueError, match="schemas differ"):
        join_view_delta(a, b, c, c, "k", "rk")
    with pytest.raises(ValueError, match="share column names"):
        join_view_delta(a, a, a, a, "k", "k")
    with pytest.raises(ValueError, match="same length"):
        join_view_delta(a, a, c, c, ["k", "v"], ["rk"])
