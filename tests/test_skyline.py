"""skyline_2d: Pareto frontier via sample-sort suffix-max carry."""

import random

from pyspark.sql import functions as F

from pangool_spark.operators.partitioning import skyline_2d


def _brute(rows):
    out = []
    for a in rows:
        dominated = any(
            b[0] >= a[0] and b[1] >= a[1] and (b[0] > a[0] or b[1] > a[1])
            for b in rows
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_closed_form_frontier(spark):
    rows = [(1, 5), (2, 4), (3, 3), (2, 5), (0, 9), (3, 1)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    assert got == [(0, 9), (2, 5), (3, 3)]


def test_duplicates_of_frontier_point_survive(spark):
    rows = [(5, 5), (5, 5), (4, 6), (5, 4)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    assert got == [(4, 6), (5, 5), (5, 5)]


def test_nulls_neither_join_nor_dominate(spark):
    rows = [(None, 100), (100, None), (1, 1)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = [(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()]
    assert got == [(1, 1)]


def test_brute_force_random(spark):
    rng = random.Random(0x5C)
    for trial in range(3):
        rows = [
            (rng.randint(0, 30), rng.randint(0, 30)) for _ in range(120)
        ]
        df = spark.createDataFrame(rows, "x bigint, y bigint")
        got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
        assert got == _brute(rows), f"trial {trial}"


def test_parts_fixture_frontier(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey",
        F.col("p_size").alias("x"),
        (-F.round(F.col("p_retailprice") * 100).cast("bigint")).alias("y"),
    )
    n = skyline_2d(part, "x", "y").count()
    assert 1 < n < 50  # probed: 5 at sf0.001
