"""Snapshot maintenance: merge_upsert / keep_latest / scd2_history."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.upsert import keep_latest, merge_upsert, scd2_history


def test_merge_upsert_replaces_inserts_and_carries(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k LONG, v STRING, x DOUBLE"
    )
    updates = spark.createDataFrame(
        [(2, "B2", 21.0), (9, "new", 90.0)], "k LONG, v STRING, x DOUBLE"
    )
    got = {r.k: (r.v, r.x) for r in merge_upsert(base, updates, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B2", 21.0), 3: ("c", 30.0), 9: ("new", 90.0)}


def test_merge_upsert_column_mismatch_raises(spark):
    base = spark.createDataFrame([(1, "a")], "k LONG, v STRING")
    upd = spark.createDataFrame([(1, "a", 1.0)], "k LONG, v STRING, extra DOUBLE")
    with pytest.raises(ValueError, match="matching columns"):
        merge_upsert(base, upd, ["k"])


def test_merge_upsert_composite_key_and_column_order(spark):
    base = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")], "a LONG, b LONG, v STRING")
    # updates with a DIFFERENT column order must still merge correctly
    upd = spark.createDataFrame([("Y2", 1, 2)], "v STRING, a LONG, b LONG")
    got = {(r.a, r.b): r.v for r in merge_upsert(base, upd, ["a", "b"]).collect()}
    assert got == {(1, 1): "x", (1, 2): "Y2"}


def test_keep_latest_picks_greatest_order_tuple(spark):
    df = spark.createDataFrame(
        [(1, 10, 100, "old"), (1, 20, 99, "new"), (1, 20, 101, "newest"), (2, 5, 1, "only")],
        "k LONG, ts LONG, seq LONG, v STRING",
    )
    got = {r.k: r.v for r in keep_latest(df, ["k"], ["ts", "seq"]).collect()}
    assert got == {1: "newest", 2: "only"}
    plan = keep_latest(df, ["k"], ["ts", "seq"])._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_merge_upsert_on_bucketed_tables_is_exchange_free(spark, tmp_path):
    """The 100 TB daily-snapshot claim, pinned: with base and delta both
    bucketed on the key, merge_upsert's anti-join runs without ANY
    exchange — scan, zipped bucket join, union."""
    import shutil

    from pangool_spark.operators.partitioning import read_bucketed, write_bucketed

    for t in ("b_up_base", "b_up_delta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    base = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    delta = spark.range(0, 1000).select(
        (F.col("id") * 10).alias("k"), F.lit(99).cast("long").alias("v")
    )
    write_bucketed(base, "b_up_base", ["k"], 8)
    write_bucketed(delta, "b_up_delta", ["k"], 8)
    merged = merge_upsert(
        read_bucketed(spark, "b_up_base"), read_bucketed(spark, "b_up_delta"), ["k"]
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = merged._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "Exchange" not in plan
    assert merged.count() == 10000
    assert merged.filter("v = 99").count() == 1000


def test_scd2_history_intervals(spark):
    df = spark.createDataFrame(
        [(1, 10, "bronze"), (1, 20, "silver"), (1, 30, "gold"), (2, 5, "bronze")],
        "k LONG, ts LONG, tier STRING",
    )
    rows = {
        (r.k, r.valid_from): (r.tier, r.valid_to, r.is_current)
        for r in scd2_history(df, ["k"], "ts").collect()
    }
    assert rows == {
        (1, 10): ("bronze", 20, False),
        (1, 20): ("silver", 30, False),
        (1, 30): ("gold", None, True),
        (2, 5): ("bronze", None, True),
    }
    # attr_cols default: everything but keys and ts
    cols = set(scd2_history(df, ["k"], "ts").columns)
    assert cols == {"k", "tier", "valid_from", "valid_to", "is_current"}


def test_point_in_time_join(spark):
    import datetime as dt

    from pangool_spark.operators.upsert import point_in_time_join, scd2_history

    def _t(d):
        return dt.datetime(2024, 1, d)

    changes = spark.createDataFrame(
        [(1, _t(1), "bronze"), (1, _t(10), "silver"), (1, _t(20), "gold"),
         (2, _t(5), "bronze")],
        "user_id LONG, ts TIMESTAMP, tier STRING",
    )
    hist = scd2_history(changes, ["user_id"], "ts", ["tier"])
    probe = spark.createDataFrame(
        [(100, 1, _t(1)),   # exactly at a version start: allow_exact
         (101, 1, _t(15)),  # mid-silver
         (102, 1, _t(25)),  # open-ended gold
         (103, 2, _t(4)),   # before any version: NULL
         (104, 3, _t(9))],  # unknown key: NULL
        "probe_id LONG, user_id LONG, ts TIMESTAMP",
    )
    got = {r.probe_id: r.pit_tier for r in
           point_in_time_join(probe, hist, ["user_id"]).collect()}
    assert got == {100: "bronze", 101: "silver", 102: "gold", 103: None, 104: None}
    # GAPPED history: an expired version must NOT leak past its valid_to
    gapped = hist.filter("tier <> 'silver'")  # [jan10, jan20) removed
    got2 = {r.probe_id: r.pit_tier for r in
            point_in_time_join(probe, gapped, ["user_id"]).collect()}
    assert got2[101] is None  # bronze expired jan10; silver deleted
    assert got2[102] == "gold"
    # strict mode: a probe exactly at valid_from sees the PREVIOUS version
    strict = {r.probe_id: r.pit_tier for r in
              point_in_time_join(probe, hist, ["user_id"], allow_exact=False).collect()}
    assert strict[100] is None
    import pytest as _pytest
    with _pytest.raises(ValueError, match="attribute"):
        point_in_time_join(probe, hist.select("user_id", "valid_from", "valid_to"), ["user_id"])
