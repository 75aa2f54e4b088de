"""applyInPandasWithState custom stateful operator: state carries across
micro-batches; batch fallback computes the same totals."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.streaming import read_stream, stateful_running_totals


def test_stateful_running_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"
    raw = "event_id LONG, ts STRING, user_id LONG, value DOUBLE"
    batch1 = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, 1.5), (2, "2024-01-01 10:01:00", 2, 2.0)], raw
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch1.write.parquet(src + "/b1")

    def run(tag):
        out_dir = str(tmp_path / f"out_{tag}")

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            stateful_running_totals(read_stream(spark, src + "/*", schema, max_files_per_trigger=1))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.user_id: (r.n_events, r.total_value) for r in spark.read.parquet(out_dir).collect()}

    got1 = run("b1")
    assert got1 == {1: (1, 1.5), 2: (1, 2.0)}

    # second micro-batch: state must carry the first batch's totals
    batch2 = spark.createDataFrame(
        [(3, "2024-01-01 10:05:00", 1, 4.0)], raw
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch2.write.parquet(src + "/b2")
    got2 = run("b2")
    assert got2[1] == (2, 5.5)  # 1.5 + 4.0 across batches via state store


def test_stateful_batch_fallback(spark):
    df = spark.createDataFrame(
        [(1, 1.5), (1, 4.0), (2, 2.0)], "user_id LONG, value DOUBLE"
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in stateful_running_totals(df).collect()}
    assert got == {1: (2, 5.5), 2: (1, 2.0)}
