"""Skew salting + bucketed co-located joins."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.data import load_table
from pangool_spark.operators.partitioning import (
    cluster_by,
    read_bucketed,
    salted_agg,
    write_bucketed,
)


def test_salted_agg_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        r.l_returnflag: (r.n, r.qty, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, r.qty, r.mx)
        for r in salted_agg(
            li.withColumn("qdec", F.col("l_quantity").cast("decimal(18,2)")),
            ["l_returnflag"],
            {"n": ("count", "l_quantity"), "qty": ("sum", "qdec"), "mx": ("max", "l_extendedprice")},
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.createDataFrame([(1, 2)], "k INT, v INT")
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"a": ("avg", "v")})


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # warehouse dir is a static conf; tables land in ./spark-warehouse.
    # The in-memory catalog forgets tables between sessions but leaves the
    # directories — remove both registration and location.
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o.select("o_orderkey", "o_totalprice"), "b_orders", ["o_orderkey"], 8)
    write_bucketed(
        li.select("l_orderkey", "l_quantity"), "b_lineitem", ["l_orderkey"], 8
    )
    bo = read_bucketed(spark, "b_orders")
    bl = read_bucketed(spark, "b_lineitem")
    joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
    # co-located: the sort-merge join reads both bucketed tables without
    # any shuffle (broadcast must not kick in for the assertion to bite)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "Exchange" not in plan
    assert joined.count() > 0


def test_cluster_by_sorts_within_partitions(spark):
    df = spark.createDataFrame([(2, "b"), (1, "a"), (2, "a"), (1, "b")], "k INT, v STRING")
    out = cluster_by(df, ["k"], n_partitions=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan and "Sort [k" in plan