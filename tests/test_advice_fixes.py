"""Regression tests for round-1 advisor findings (ADVICE.md r01)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pangool_spark.plans import JobBuilder, PlanError


def test_named_outputs_roundtrip_numpy_scalars(spark):
    # np.int64 (the natural dtype of pandas sums) must survive the tagged
    # JSON hop in to_dataframes — previously serialized as "5" and the whole
    # row silently nulled by from_json.
    df = spark.createDataFrame([(1, 2), (1, 3), (2, 5)], "k INT, v INT")

    def reduce_fn(key, pdf, collector):
        total = pdf["v"].sum()  # np.int64
        assert isinstance(total, np.integer)
        collector.write({"k": key[0], "total": total})
        collector.write({"k": key[0], "total": total}, output="side")

    jb = (
        JobBuilder(spark)
        .add_input(df, "k:int,v:int")
        .set_group_by("k")
        .set_reducer(reduce_fn, "k:int,total:long")
        .add_named_output("side", "k:int,total:long")
    )
    outs = jb.to_dataframes()
    main = {r.k: r.total for r in outs[""].collect()}
    side = {r.k: r.total for r in outs["side"].collect()}
    assert main == {1: 5, 2: 5}
    assert side == {1: 5, 2: 5}


def test_named_outputs_without_reducer_rejected(spark):
    from pangool_spark.queries import _SubtotalRollup

    df = spark.createDataFrame([(1, "a", 1.0)], "k INT, s STRING, v DOUBLE")
    jb = (
        JobBuilder(spark)
        .add_input(df, "k:int,s:string,v:double")
        .set_group_by("k", "s")
        .set_rollup_from("k")
        .set_rollup_reducer(_SubtotalRollup(["k", "s"], "v"), "depth:int,total:double")
        .add_named_output("side", "k:int")
    )
    with pytest.raises(PlanError, match="set_reducer"):
        jb.to_dataframes()


def test_rollup_collector_rejects_named_writes():
    from pangool_spark.plans.job import Collector, PlanError

    c = Collector(allow_named=False)
    c.write({"a": 1})  # main output fine
    with pytest.raises(PlanError, match="named output"):
        c.write({"a": 1}, output="side")


def test_decimal_sum_accepts_column(spark):
    from pangool_spark import functions as PF

    df = spark.createDataFrame([(0.1,), (0.2,), (0.3,)], "v DOUBLE")
    # Column argument must get the decimal cast too (was silently a double sum)
    by_str = df.agg(PF.decimal_sum("v").alias("s")).collect()[0].s
    by_col = df.agg(PF.decimal_sum(F.col("v")).alias("s")).collect()[0].s
    assert by_str == by_col
    from decimal import Decimal

    assert isinstance(by_col, Decimal)
    assert float(by_col) == pytest.approx(0.6)


def test_connected_components_raises_on_truncation(spark):
    from pangool_spark.operators.graph import connected_components

    # path graph 0-1-2-3-4-5: min-label needs ~diameter rounds to converge
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a LONG, id_b LONG"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=1, algorithm="label")
    comps = connected_components(edges, max_iterations=20, algorithm="label")
    assert {r.component for r in comps.collect()} == {0}
    # the auto default never needs the guess: a 1-round probe falls back
    # to the star algorithm instead of raising
    auto = connected_components(edges, probe_rounds=1)
    assert {r.component for r in auto.collect()} == {0}


def test_windowed_agg_unaliased_aggregate(spark):
    import datetime

    from pangool_spark.streaming import windowed_agg

    rows = [
        (datetime.datetime(2024, 1, 1, 0, m), 1.0) for m in (1, 2, 31)
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, value DOUBLE")
    out = windowed_agg(df, "ts", "30 minutes", [F.sum("value"), F.count(F.lit(1)).alias("n")])
    got = {(r.window_start.minute, r[2], r.n) for r in out.collect()}
    assert got == {(0, 2.0, 2), (30, 1.0, 1)}
