"""grouped_outliers (z-score flagging vs a Python reference) and
stable_row_ids (dense total-order ids vs row_number, without the
single-partition window)."""

import math
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pangool_spark.operators.partitioning import stable_row_ids
from pangool_spark.operators.stats import grouped_outliers


def _brute_outliers(rows, z):
    by_g = {}
    for g, y in rows:
        if y is not None:
            by_g.setdefault(g, []).append(y)
    out = set()
    for g, ys in by_g.items():
        n = len(ys)
        if n < 2:
            continue
        mu = sum(ys) / n
        var = (n * sum(v * v for v in ys) - sum(ys) ** 2) / (n * n)
        if var <= 0:
            continue
        for y in ys:
            if abs(y - mu) > z * math.sqrt(var):
                out.add((g, y))
    return out


def test_outliers_match_bruteforce(spark):
    rng = random.Random(7)
    rows = []
    for g in range(6):
        rows += [(g, rng.randint(-50, 50)) for _ in range(40)]
        rows.append((g, 10_000))  # a planted spike per group
    rows += [(99, None), (98, 5)]  # null value; singleton group
    df = spark.createDataFrame(rows, "g INT, y LONG")
    got = {(r.g, r.y) for r in grouped_outliers(df, ["g"], "y", z=3.0).collect()}
    assert got == _brute_outliers(rows, 3.0)
    assert (99, None) not in got and (98, 5) not in got
    # zscore values match the fixed IEEE op sequence
    one = grouped_outliers(df, ["g"], "y", z=3.0).filter("g = 0").first()
    ys = [y for g, y in rows if g == 0 and y is not None]
    n, sy, syy = len(ys), sum(ys), sum(v * v for v in ys)
    mu = sy / n
    sigma = math.sqrt((n * syy - sy * sy) / (n * n))
    assert one.zscore == (one.y - mu) / sigma


def test_outliers_validation(spark):
    df = spark.createDataFrame([(1, 2)], "g INT, y LONG")
    with pytest.raises(ValueError, match="group column"):
        grouped_outliers(df, [], "y")
    with pytest.raises(ValueError, match="z must be"):
        grouped_outliers(df, ["g"], "y", z=0.0)
    with pytest.raises(ValueError, match="zscore"):
        grouped_outliers(df.withColumn("zscore", F.lit(1.0)), ["g"], "y")


def test_stable_ids_match_window_row_number(spark):
    rng = random.Random(3)
    keys = rng.sample(range(100_000), 500)
    df = spark.createDataFrame([(k, k % 7) for k in keys], "k LONG, v INT")
    got = stable_row_ids(df, ["k"], n_buckets=7, sample_per_bucket=8)
    want = df.withColumn("row_id", F.row_number().over(Window.orderBy("k")).cast("long"))
    assert got.count() == 500
    diff = got.select("row_id", "k").exceptAll(want.select("row_id", "k"))
    assert diff.count() == 0
    # dense 1..N, stable across re-execution (the flaky-boundary trap)
    for _ in range(2):
        agg = got.agg(
            F.min("row_id"), F.max("row_id"), F.countDistinct("row_id")
        ).first()
        assert tuple(agg) == (1, 500, 500)
    # multi-column order: ties on k0 broken by k1 across bucket boundary
    df2 = spark.createDataFrame(
        [(i // 10, i % 10) for i in range(200)], "a LONG, b LONG"
    )
    got2 = stable_row_ids(df2, ["a", "b"], n_buckets=5, sample_per_bucket=4)
    want2 = {((i // 10), (i % 10)): i + 1 for i in range(200)}
    assert {(r.a, r.b): r.row_id for r in got2.collect()} == want2


def test_stable_ids_plan_and_edges(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "k LONG")
    out = stable_row_ids(df, ["k"], n_buckets=4, sample_per_bucket=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every window is PARTITIONED by the bucket — no global-sort window
    for line in plan.splitlines():
        if "Window" in line:
            assert "__bkt__" in line, line
    # empty input keeps schema, yields nothing
    empty = stable_row_ids(df.filter("k < 0"), ["k"], n_buckets=4)
    assert empty.count() == 0 and empty.columns == ["row_id", "k"]
    with pytest.raises(ValueError, match="order column"):
        stable_row_ids(df, [])
    with pytest.raises(ValueError, match="not in input"):
        stable_row_ids(df, ["nope"])
    with pytest.raises(ValueError, match="already has"):
        stable_row_ids(df.withColumn("row_id", F.lit(1)), ["k"])


def test_global_running_sum_matches_window(spark):
    from pangool_spark.operators.partitioning import global_running_sum

    rng = random.Random(9)
    keys = rng.sample(range(100_000), 400)
    df = spark.createDataFrame(
        [(k, k % 97, None if k % 31 == 0 else k % 1000) for k in keys],
        "k LONG, g INT, v LONG",
    )
    got = global_running_sum(df, ["k"], "v", n_buckets=7, sample_per_bucket=8)
    want = df.withColumn(
        "running_total",
        F.sum(F.coalesce("v", F.lit(0))).over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert got.count() == 400
    assert (
        got.select("k", "running_total")
        .exceptAll(want.select("k", "running_total"))
        .count()
        == 0
    )
    # every Window in the plan is bucket-partitioned
    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line:
            assert "__bkt__" in line, line
    with pytest.raises(ValueError, match="integer value"):
        global_running_sum(df.withColumn("d", F.lit(1.5)), ["k"], "d")
    with pytest.raises(ValueError, match="already has"):
        global_running_sum(df.withColumn("running_total", F.lit(1)), ["k"], "v")


def test_sample_sort_buckets_survive_low_cardinality_leading_key(spark):
    """Round-11 regression: `_bucketed` must hash-sample the full order
    tuple, not the leading key's VALUES — with a low-cardinality leading
    key the old value-hash sample came back empty, bounds collapsed, and
    the downstream window ran unpartitioned (one task walking the whole
    relation at the 100x probe)."""
    from pangool_spark.operators.partitioning import (
        _bucketed,
        global_running_sum,
    )
    from pyspark.sql import functions as F

    # 200k rows, only 50 distinct leading-key values — the zorder shape
    df = spark.range(200_000).select(
        (F.col("id") % 50).alias("z"),
        F.col("id").alias("rid"),
        F.lit(1).cast("int").alias("one"),
    )
    m = _bucketed(df, ["z", "rid"], 32, 128)
    n_buckets = m.select("__bkt__").distinct().count()
    assert n_buckets >= 16, f"bounds collapsed to {n_buckets} bucket(s)"
    # and the prefix sum over that bucketing is still exactly 1..N
    out = global_running_sum(df, ["z", "rid"], "one", out_col="rn")
    assert out.agg(
        F.min("rn"), F.max("rn"), F.count_distinct("rn")
    ).first() == (1, 200_000, 200_000)
