"""Physical-plan gates for the round-9 session-2 operators: the scale
claims in their docstrings, asserted against the executed plan."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.data import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_pseudonymize_is_map_only(spark, sf):
    from pangool_spark.operators.upsert import pseudonymize

    cust = load_table(spark, sf, "customer").select("c_custkey", "c_name")
    plan = _plan(pseudonymize(cust, ["c_custkey", "c_name"], salt="s"))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan  # no UDFs anywhere


def test_ams_f2_no_explode_no_python(spark, sf):
    from pangool_spark.operators.sketch import ams_f2

    li = load_table(spark, sf, "lineitem")
    plan = _plan(ams_f2(li, "l_orderkey"))
    # the 64 counters run as aggregate expressions, not a x64 explode
    assert "Generate explode" not in plan
    assert "EvalPython" not in plan
    # partial + final aggregate pairs (map-side combine before shuffle)
    assert "HashAggregate" in plan


def test_acf_single_window_shuffle(spark, sf):
    from pangool_spark.operators.stats import grouped_acf

    ev = load_table(spark, sf, "events").select(
        "event_type", "ts", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    plan = _plan(grouped_acf(ev, ["event_type"], ["ts", "event_id"], "cents"))
    # one hash-partitioned exchange feeds both the window and the
    # same-key aggregate (Catalyst reuses the partitioning)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_gini_single_window_shuffle(spark, sf):
    from pangool_spark.operators.profile import gini_coefficient

    cust = load_table(spark, sf, "customer").select(
        F.col("c_nationkey").alias("g"),
        F.col("c_custkey").cast("bigint").alias("v"),
    )
    plan = _plan(gini_coefficient(cust, ["g"], "v"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_benford_no_single_partition_window(spark, sf):
    from pangool_spark.operators.profile import benford_audit

    orders = load_table(spark, sf, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    plan = _plan(benford_audit(orders, "cents", group_cols=["cents"]))
    # grouped form must partition the total window by the group key
    assert "Exchange SinglePartition" not in plan.split("HashAggregate")[0]


def test_hamming_neardup_joins_on_band_not_cartesian(spark):
    from pangool_spark.operators.dedup import hamming_neardup_pairs

    df = spark.createDataFrame(
        [(1, "00" * 8), (2, "01" * 8)], ["media_id", "dhash"]
    )
    plan = _plan(hamming_neardup_pairs(df))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_phrase_search_no_cartesian_text_pruned(spark, sf):
    from pangool_spark.operators.text import phrase_search

    docs = load_table(spark, sf, "documents")
    plan = _plan(phrase_search(docs, "slow hash batch"))
    assert "CartesianProduct" not in plan
    # only doc_id and text reach the scan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read_schema and "source" not in read_schema


def test_cluster_topics_broadcasts_total(spark):
    from pangool_spark.operators.ml import cluster_topics

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], ["doc_id", "text"]
    )
    assign = spark.createDataFrame([(1, 0), (2, 1)], ["doc_id", "cell"])
    plan = _plan(cluster_topics(assign, docs, min_count=1))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_decision_stump_no_single_partition_window(spark, sf):
    from pangool_spark.operators.ml import decision_stump

    orders = load_table(spark, sf, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("p"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("y"),
    )
    plan = _plan(decision_stump(orders, "y", ["p"]))
    # cumulative counts come from sample-sort prefix sums, never a global
    # ORDER BY window (rangepartitioning exchange)
    assert "Exchange rangepartitioning" not in plan


def test_sorted_neighborhood_no_cartesian(spark, sf):
    from pangool_spark.operators.fuzzy import sorted_neighborhood_pairs

    part = load_table(spark, sf, "part")
    plan = _plan(
        sorted_neighborhood_pairs(part, "p_partkey", "p_name", window=10)
    )
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan
