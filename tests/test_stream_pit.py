"""stream_point_in_time_join: stream-static interval join == the batch
point_in_time_join on real micro-batches; batch fallback; gapped history."""

import datetime as dt

from pyspark.sql import functions as F

from pangool_spark.operators.upsert import point_in_time_join, scd2_history
from pangool_spark.streaming import read_stream
from pangool_spark.streaming.ops import stream_point_in_time_join


def _t(d):
    return dt.datetime(2024, 1, d)


def _history(spark):
    changes = spark.createDataFrame(
        [(1, _t(1), "bronze"), (1, _t(10), "silver"), (1, _t(20), "gold"),
         (2, _t(5), "bronze")],
        "user_id LONG, ts TIMESTAMP, tier STRING",
    )
    return scd2_history(changes, ["user_id"], "ts", ["tier"])


PROBES = [
    (100, 1, 1),   # exactly at a version start
    (101, 1, 15),  # mid-silver
    (102, 1, 25),  # open-ended gold
    (103, 2, 4),   # before any version -> NULLs
    (104, 3, 9),   # unknown key -> NULLs
]


def _probe_rows():
    return [(pid, uid, _t(d)) for pid, uid, d in PROBES]


def test_stream_equals_batch_on_micro_batches(spark, tmp_path):
    hist = _history(spark)
    src = str(tmp_path / "src")
    rows = _probe_rows()
    schema = "probe_id LONG, user_id LONG, ts TIMESTAMP"
    for i, r in enumerate(rows):  # one file per probe: 5 micro-batches
        spark.createDataFrame([r], schema).write.parquet(f"{src}/b{i}")
    out_dir = str(tmp_path / "out")

    def sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_point_in_time_join(
            read_stream(spark, src + "/*", schema, max_files_per_trigger=1),
            hist, ["user_id"],
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None

    got = {r.probe_id: (r.pit_tier, r.pit_valid_from, r.pit_valid_to)
           for r in spark.read.parquet(out_dir).collect()}
    probe = spark.createDataFrame(rows, schema)
    want = {r.probe_id: (r.pit_tier, r.pit_valid_from, r.pit_valid_to)
            for r in point_in_time_join(probe, hist, ["user_id"]).collect()}
    assert got == want
    assert got[101] == ("silver", _t(10), _t(20))
    assert got[103] == (None, None, None)
    assert got[104] == (None, None, None)


def test_gapped_history_stream(spark, tmp_path):
    # expired versions must not leak on the streaming path either
    hist = _history(spark).filter("tier <> 'silver'")
    src = str(tmp_path / "src")
    schema = "probe_id LONG, user_id LONG, ts TIMESTAMP"
    spark.createDataFrame(_probe_rows(), schema).write.parquet(src + "/b0")
    out_dir = str(tmp_path / "out")

    q = (
        stream_point_in_time_join(
            read_stream(spark, src + "/*", schema), hist, ["user_id"]
        )
        .writeStream.foreachBatch(
            lambda b, _i: b.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = {r.probe_id: r.pit_tier
           for r in spark.read.parquet(out_dir).collect()}
    assert got[101] is None  # bronze expired jan10; silver deleted
    assert got[102] == "gold"


def test_batch_fallback_matches_operator(spark):
    hist = _history(spark)
    probe = spark.createDataFrame(
        _probe_rows(), "probe_id LONG, user_id LONG, ts TIMESTAMP"
    )
    got = stream_point_in_time_join(probe, hist, ["user_id"])
    want = point_in_time_join(probe, hist, ["user_id"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.columns == want.columns
