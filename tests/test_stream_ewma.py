"""stream_ewma: stateful streaming EWMA == batch ewma on in-order arrivals."""

from pyspark.sql import functions as F

from pangool_spark.operators.windows import ewma
from pangool_spark.streaming import read_stream
from pangool_spark.streaming.ops import stream_ewma

RAW = "event_id LONG, ts STRING, user_id LONG, value DOUBLE"
SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"

ROWS_B1 = [
    (1, "2024-01-01 10:00:00", 1, 10.0),
    (2, "2024-01-01 10:01:00", 1, 20.0),
    (3, "2024-01-01 10:00:30", 2, 5.0),
]
ROWS_B2 = [
    (4, "2024-01-01 10:05:00", 1, 40.0),
    (5, "2024-01-01 10:06:00", 2, 7.0),
]


def _write(spark, rows, path):
    # one part file per micro-batch dir: with several part files, the
    # file-stream source breaks same-mtime ties by (random-UUID) path,
    # so maxFilesPerTrigger=1 could deliver a LATER event in an EARLIER
    # batch — violating this fixture's in-order-arrival contract and
    # flipping the EWMA fold order (observed flake under load)
    (
        spark.createDataFrame(rows, RAW)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1)
        .write.parquet(path)
    )


def test_stream_equals_batch_across_micro_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, ROWS_B1, src + "/b1")
    _write(spark, ROWS_B2, src + "/b2")
    out_dir = str(tmp_path / "out")

    def sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_ewma(
            read_stream(spark, src + "/*", SCHEMA, max_files_per_trigger=1)
        )
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last update per key = final state
    import pandas as pd

    pdf = spark.read.parquet(out_dir).toPandas()
    final = {
        int(k): (int(g["n_obs"].max()), g.loc[g["n_obs"].idxmax(), "ewma"])
        for k, g in pdf.groupby("user_id")
    }

    batch_df = (
        spark.createDataFrame(ROWS_B1 + ROWS_B2, RAW)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    want = {
        r.user_id: (r.n_obs, r.ewma)
        for r in ewma(
            batch_df, ["user_id"], ["ts", "event_id"], "value", alpha=0.3
        ).collect()
    }
    assert final == want  # bit-identical recursion, stream == batch


def test_batch_fallback_is_windows_ewma(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, 3.0), (2, "2024-01-01 10:01:00", 1, 9.0)],
        RAW,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    [r] = stream_ewma(df).collect()
    assert (r.user_id, r.n_obs, r.ewma) == (1, 2, 0.3 * 9.0 + 0.7 * 3.0)
