"""group_quality_gate: group-granularity admission gate."""

import pytest

from pangool_spark.operators.profile import group_quality_gate


def _df(spark):
    rows = [
        # group A: 3 rows, mean 20 -> passes n>=2, mean in [10, 30]
        (1, "A", 10), (2, "A", 20), (3, "A", 30),
        # group B: 1 row -> fails min_rows
        (4, "B", 25),
        # group C: 2 rows, mean 50 -> fails max_mean
        (5, "C", 40), (6, "C", 60),
        # group D: 2 rows, mean 5 -> fails min_mean
        (7, "D", 0), (8, "D", 10),
    ]
    return spark.createDataFrame(rows, "id bigint, g string, m bigint")


def test_gate_conditions_compose(spark):
    out = group_quality_gate(
        _df(spark), ["g"], "m", min_rows=2, min_mean=10.0, max_mean=30.0
    )
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]


def test_only_min_rows(spark):
    out = group_quality_gate(_df(spark), ["g"], "m", min_rows=2)
    assert sorted(r.id for r in out.collect()) == [1, 2, 3, 5, 6, 7, 8]


def test_rejects_double_metric(spark):
    from pyspark.sql import functions as F

    df = _df(spark).withColumn("d", F.lit(1.5))
    with pytest.raises(ValueError, match="integer metric"):
        group_quality_gate(df, ["g"], "d", min_rows=1)


def test_multi_key_groups(spark):
    rows = [(1, "A", "x", 100), (2, "A", "x", 200), (3, "A", "y", 100)]
    df = spark.createDataFrame(rows, "id bigint, g string, h string, m bigint")
    out = group_quality_gate(df, ["g", "h"], "m", min_rows=2)
    assert sorted(r.id for r in out.collect()) == [1, 2]
