"""stream_heavy_hitters: the accumulated streaming top-k snapshot ==
a batch groupBy-count + rank over the same rows, pinned on real
micro-batches, plus replay idempotency and the k guard."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pangool_spark.streaming.ops import read_stream, stream_heavy_hitters


def _batch_topk(spark, rows, k):
    df = spark.createDataFrame(rows, "key STRING")
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "key", "cnt")
        .collect()
    )


def test_stream_topk_equals_batch(spark, tmp_path):
    keys = "abcde"
    rows = [(keys[(i * i) % 5],) for i in range(60)]
    src = str(tmp_path / "src")
    for b in range(3):
        spark.createDataFrame(
            rows[b * 20 : (b + 1) * 20], "key STRING"
        ).coalesce(1).write.parquet(f"{src}/b{b}")
    state = str(tmp_path / "state")
    q = stream_heavy_hitters(
        read_stream(spark, src + "/*", "key STRING", max_files_per_trigger=1),
        "key",
        k=3,
        state_dir=state,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    # one snapshot per micro-batch; each is the exact top-3 of its prefix
    for b in range(3):
        got = sorted(
            spark.read.parquet(f"{state}/_TOPK/batch_id={b}").collect(),
            key=lambda r: r["rank"],
        )
        want = _batch_topk(spark, rows[: (b + 1) * 20], 3)
        assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_stream_topk_replay_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("x",), ("x",), ("y",)], "key STRING"
    ).coalesce(1).write.parquet(f"{src}/b0")
    state = str(tmp_path / "state")

    def run(ckpt):
        q = stream_heavy_hitters(
            read_stream(spark, src + "/*", "key STRING", max_files_per_trigger=1),
            "key",
            k=2,
            state_dir=state,
            checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination(120)

    run("ckpt1")
    # fresh checkpoint replays batch 0: the fold must be skipped
    run("ckpt2")
    counts = spark.read.parquet(f"{state}/counts").collect()
    got = {r["key"]: r["cnt"] for r in counts}
    assert got == {"x": 2, "y": 1}
    snap = spark.read.parquet(f"{state}/_TOPK/batch_id=0").collect()
    assert {(r["rank"], r["key"], r["cnt"]) for r in snap} == {
        (1, "x", 2),
        (2, "y", 1),
    }


def test_stream_topk_restart_continues(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame([("a",), ("b",)], "key STRING").coalesce(
        1
    ).write.parquet(f"{src}/b0")
    state = str(tmp_path / "state")

    def run():
        q = stream_heavy_hitters(
            read_stream(spark, src + "/*", "key STRING", max_files_per_trigger=1),
            "key",
            k=5,
            state_dir=state,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame([("b",), ("b",)], "key STRING").coalesce(
        1
    ).write.parquet(f"{src}/b1")
    run()  # restart: only the new file arrives; standing counts fold
    counts = {r["key"]: r["cnt"] for r in spark.read.parquet(f"{state}/counts").collect()}
    assert counts == {"a": 1, "b": 3}


def test_stream_topk_rejects_bad_k(spark, tmp_path):
    with pytest.raises(ValueError):
        stream_heavy_hitters(
            read_stream(spark, str(tmp_path) + "/*", "key STRING"),
            "key",
            k=0,
            state_dir=str(tmp_path / "state"),
        )
