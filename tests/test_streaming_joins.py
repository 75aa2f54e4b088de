"""Streaming joins: the streaming path must equal the batch path (real
micro-batch runs to completion), and state must be bounded (watermark +
range constraint present on stream-stream)."""

import json
import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from pangool_spark.streaming import (
    foreach_batch_sink,
    read_stream,
    stream_static_join,
    stream_stream_join,
)


@pytest.fixture(scope="module")
def clicks(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100),
            (2, "2024-01-01 10:20:00", 200),
            (3, "2024-01-01 12:00:00", 100),
        ],
        "click_id LONG, cts STRING, user_id LONG",
    )
    return df.withColumn("cts", F.col("cts").cast("timestamp"))


@pytest.fixture(scope="module")
def buys(spark):
    df = spark.createDataFrame(
        [
            (10, "2024-01-01 10:30:00", 100),  # within 1h of click 1
            (11, "2024-01-01 14:30:00", 100),  # >1h from any click of user 100
            (12, "2024-01-01 10:25:00", 200),  # within 1h of click 2
        ],
        "buy_id LONG, bts STRING, user_id LONG",
    )
    return df.withColumn("bts", F.col("bts").cast("timestamp"))


def _as_stream(spark, df, tmp_path_factory, name):
    path = str(tmp_path_factory.mktemp(name))
    df.write.mode("overwrite").parquet(path)
    return read_stream(spark, path, df.schema)


def _run_append_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_static_join_matches_batch(spark, clicks, tmp_path_factory):
    users = spark.createDataFrame([(100, "ana"), (200, "bob")], "user_id LONG, name STRING")
    s = _as_stream(spark, clicks, tmp_path_factory, "ss_clicks")
    joined = stream_static_join(s, users, on=["user_id"])
    got = {
        (r.click_id, r.name)
        for r in _run_append_to_memory(spark, joined, f"t{uuid.uuid4().hex[:8]}").collect()
    }
    exp = {(r.click_id, r.name) for r in clicks.join(users, "user_id").collect()}
    assert got == exp and len(exp) == 3


def test_stream_stream_join_matches_batch(spark, clicks, buys, tmp_path_factory):
    sc_ = _as_stream(spark, clicks, tmp_path_factory, "s2_clicks")
    sb = _as_stream(spark, buys, tmp_path_factory, "s2_buys")
    joined = stream_stream_join(
        sc_, sb, on=["user_id"], left_ts="cts", right_ts="bts", watermark="2 hours", within="1 hour"
    )
    got = {
        (r.click_id, r.buy_id)
        for r in _run_append_to_memory(spark, joined, f"t{uuid.uuid4().hex[:8]}").collect()
    }
    # batch parity: same operator on batch frames
    exp = {
        (r.click_id, r.buy_id)
        for r in stream_stream_join(
            clicks, buys, on=["user_id"], left_ts="cts", right_ts="bts", within="1 hour"
        ).collect()
    }
    # range constraint: click 1 (10:00) matches buy 10 (10:30); click 2
    # (10:20) matches buy 12 (10:25); click 3 (12:00) is 1.5h from buy 10
    # and buy 11 is >1h from everything
    assert got == exp == {(1, 10), (2, 12)}


def test_stream_stream_join_requires_both_streams_bounded(spark, clicks, buys, tmp_path_factory):
    # un-watermarked stream-stream inner join with no range constraint is
    # rejected by Spark; our API always threads both, so the plan ANALYZES
    sc_ = _as_stream(spark, clicks, tmp_path_factory, "s3_clicks")
    sb = _as_stream(spark, buys, tmp_path_factory, "s3_buys")
    joined = stream_stream_join(
        sc_, sb, on=["user_id"], left_ts="cts", right_ts="bts", within="30 minutes"
    )
    assert joined.isStreaming


def test_foreach_batch_sink_batches(spark, clicks, tmp_path_factory):
    log = os.path.join(tempfile.mkdtemp(), "stream_sink.log")

    def send_batch(client, batch):
        with open(log, "a") as f:
            f.write(json.dumps(len(batch)) + "\n")

    s = _as_stream(spark, clicks.coalesce(1), tmp_path_factory, "sink_clicks")
    q = foreach_batch_sink(
        s.coalesce(1), send_batch, batch_size=2, trigger_once=True,
        query_name=f"q{uuid.uuid4().hex[:8]}",
    )
    q.awaitTermination(120)
    sizes = sorted(json.loads(line) for line in open(log))
    assert sum(sizes) == 3 and max(sizes) <= 2
