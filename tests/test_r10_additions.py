"""Round-10 wishlist additions: windowed_dedup (event-time at-most-one-
per-period thinning) and the query-plan result cache (build/replay)."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# windowed_dedup


def test_windowed_dedup_one_survivor_per_window(spark):
    from pangool_spark.operators.dedup import windowed_dedup

    # key "a" fires 3x in hour 0 and 2x in hour 1 -> survives once per hour
    rows = [
        ("a", "1990-01-01 00:05:00", 1),
        ("a", "1990-01-01 00:02:00", 2),  # earliest in hour 0
        ("a", "1990-01-01 00:59:00", 3),
        ("a", "1990-01-01 01:30:00", 4),  # earliest in hour 1
        ("a", "1990-01-01 01:45:00", 5),
        ("b", "1990-01-01 00:10:00", 6),
    ]
    df = spark.createDataFrame(rows, "k STRING, ts_s STRING, rid LONG").select(
        "k", F.to_timestamp("ts_s").alias("ts"), "rid"
    ).repartition(3)
    got = {
        (r["k"], r["rid"])
        for r in windowed_dedup(df, ["k"], "ts", "1 hour").collect()
    }
    assert got == {("a", 2), ("a", 4), ("b", 6)}


def test_windowed_dedup_tiebreak_and_window_start(spark):
    from pangool_spark.operators.dedup import windowed_dedup

    # equal ts -> tiebreak column decides; window_start is epoch-aligned
    rows = [
        ("a", "1990-01-01 00:30:00", 9),
        ("a", "1990-01-01 00:30:00", 3),
    ]
    df = spark.createDataFrame(rows, "k STRING, ts_s STRING, rid LONG").select(
        "k", F.to_timestamp("ts_s").alias("ts"), "rid"
    )
    [row] = windowed_dedup(
        df, ["k"], "ts", "1 hour", tiebreak_cols=["rid"]
    ).collect()
    assert row["rid"] == 3
    assert row["window_start"].minute == 0 and row["window_start"].second == 0


def test_windowed_dedup_requires_keys(spark):
    from pangool_spark.operators.dedup import windowed_dedup

    df = spark.createDataFrame([("a",)], "k STRING")
    with pytest.raises(ValueError, match="key column"):
        windowed_dedup(df, [], "ts")


# ---------------------------------------------------------------------------
# plan cache


def _source(spark, tmp_path, n=100):
    path = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i % 7) for i in range(n)], "id LONG, g LONG"
    ).write.mode("overwrite").parquet(path)
    return path


def test_plan_cache_build_then_replay(spark, tmp_path):
    from pangool_spark.plans.cache import cached_result

    src = _source(spark, tmp_path)
    cache = str(tmp_path / "cache")
    q = spark.read.parquet(src).groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    built = cached_result(q, cache)
    want = {(r["g"], r["n"]) for r in built.collect()}
    # identical plan -> replay: every input file is the cache, not the source
    replay = cached_result(
        spark.read.parquet(src).groupBy("g").agg(F.count(F.lit(1)).alias("n")),
        cache,
    )
    assert all("/cache/" in f for f in replay.inputFiles())
    assert {(r["g"], r["n"]) for r in replay.collect()} == want


def test_plan_cache_different_plan_different_key(spark, tmp_path):
    from pangool_spark.plans.cache import cached_result, plan_cache_key

    src = _source(spark, tmp_path)
    q1 = spark.read.parquet(src).filter("g = 1")
    q2 = spark.read.parquet(src).filter("g = 2")
    assert plan_cache_key(q1) != plan_cache_key(q2)
    cache = str(tmp_path / "cache")
    assert cached_result(q1, cache).count() != 0
    # q2 must NOT replay q1's materialization
    got = {r["g"] for r in cached_result(q2, cache).collect()}
    assert got == {2}


def test_plan_cache_semantic_hash_ignores_alias_noise(spark, tmp_path):
    """Column order/rename-free reformulations of the same plan hit the
    same key (canonicalized-plan semantics, not source text)."""
    from pangool_spark.plans.cache import plan_cache_key

    src = _source(spark, tmp_path)
    a = spark.read.parquet(src).filter(F.col("g") == 1)
    b = spark.read.parquet(src).filter(F.col("g") == 1)
    assert plan_cache_key(a) == plan_cache_key(b)


def test_plan_cache_new_input_files_invalidate(spark, tmp_path):
    from pangool_spark.plans.cache import cached_result, plan_cache_key

    src = _source(spark, tmp_path)
    cache = str(tmp_path / "cache")
    q = spark.read.parquet(src).groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    key_before = plan_cache_key(q)
    n_before = cached_result(q, cache).agg(F.sum("n")).collect()[0][0]
    # a new partition lands in the source dir -> different key, fresh build
    spark.createDataFrame([(1000, 1)], "id LONG, g LONG").write.mode(
        "append"
    ).parquet(src)
    q2 = spark.read.parquet(src).groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    assert plan_cache_key(q2) != key_before
    n_after = cached_result(q2, cache).agg(F.sum("n")).collect()[0][0]
    assert n_after == n_before + 1


def test_plan_cache_force_rebuild(spark, tmp_path):
    from pangool_spark.plans.cache import cached_result

    src = _source(spark, tmp_path)
    cache = str(tmp_path / "cache")
    q = spark.read.parquet(src).select(F.count(F.lit(1)).alias("n"))
    assert cached_result(q, cache).collect()[0]["n"] == 100
    assert (
        cached_result(q, cache, force_rebuild=True).collect()[0]["n"] == 100
    )
