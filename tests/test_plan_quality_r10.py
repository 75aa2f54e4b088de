"""Physical-plan gates for the round-10 additions: the scale claims in
their docstrings, asserted against the executed plan."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.data import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_windowed_dedup_single_exchange_rank1(spark, sf):
    from pangool_spark.operators.dedup import windowed_dedup

    ev = load_table(spark, sf, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    plan = _plan(
        windowed_dedup(
            ev, ["user_id", "event_type"], "ts", "1 hour",
            tiebreak_cols=["event_id"],
        )
    )
    # docstring claim: ONE hash exchange on (keys, window-start), the
    # rank-1 filter pushes into WindowGroupLimit (no full-rank pass)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan


def test_plan_cache_replay_is_scan_only(spark, tmp_path):
    from pangool_spark.plans.cache import cached_result

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i % 5) for i in range(1000)], "id LONG, g LONG"
    ).write.parquet(src)
    cache = str(tmp_path / "cache")
    q = spark.read.parquet(src).groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    cached_result(q, cache)  # build
    replay = cached_result(q, cache)  # hit
    plan = _plan(replay)
    # docstring claim: the replay is a parquet scan of the RESULT —
    # no aggregate, no exchange, nothing recomputed
    assert "HashAggregate" not in plan
    assert "Exchange" not in plan
    assert "Scan parquet" in plan


def test_plan_cache_replay_prunes_columns(spark, tmp_path):
    """The cached relation is a normal scan: column pruning reaches it."""
    from pangool_spark.plans.cache import cached_result

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i % 5, str(i)) for i in range(100)], "id LONG, g LONG, s STRING"
    ).write.parquet(src)
    cache = str(tmp_path / "cache")
    q = spark.read.parquet(src).select("id", "g", "s")
    cached_result(q, cache)
    replay = cached_result(q, cache).select("g")
    plan = _plan(replay)
    assert "ReadSchema: struct<g:bigint>" in plan
