"""stream_unigram_drift: the accumulated streaming KL == the batch
unigram_kl on the same prefix, bit-exact, plus versioned-state replay
idempotency and restart continuation."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.infotheory import unigram_kl
from pangool_spark.streaming.ops import read_stream, stream_unigram_drift


def _ref(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the lazy dog sleeps")],
        "id int, text string",
    )


def _batches():
    return [
        ["alpha beta the", "gamma alpha"],
        ["the the delta", "beta beta beta"],
        ["fox epsilon", "alpha dog"],
    ]


def test_stream_kl_equals_batch(spark, tmp_path):
    ref = _ref(spark)
    src = str(tmp_path / "src")
    for i, texts in enumerate(_batches()):
        spark.createDataFrame(
            [(t,) for t in texts], "text string"
        ).coalesce(1).write.parquet(f"{src}/b{i}")
    state = str(tmp_path / "state")
    q = stream_unigram_drift(
        read_stream(spark, src + "/*", "text string", max_files_per_trigger=1),
        "text",
        ref,
        state,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    seen = []
    for i, texts in enumerate(_batches()):
        seen.extend(texts)
        [got] = spark.read.parquet(f"{state}/_KL/batch_id={i}").collect()
        prefix = spark.createDataFrame([(t,) for t in seen], "text string")
        [want] = unigram_kl(prefix, ref, "text").collect()
        assert got["vocab"] == want["vocab"]
        assert got["n_p"] == want["n_p"] and got["n_q"] == want["n_q"]
        assert got["kl_pq"] == want["kl_pq"]  # bit-exact
        assert got["kl_qp"] == want["kl_qp"]


def test_stream_kl_replay_is_idempotent(spark, tmp_path):
    ref = _ref(spark)
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("alpha beta",)], "text string"
    ).coalesce(1).write.parquet(f"{src}/b0")
    state = str(tmp_path / "state")

    def run(ckpt):
        q = stream_unigram_drift(
            read_stream(spark, src + "/*", "text string", max_files_per_trigger=1),
            "text",
            ref,
            state,
            checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination(120)

    run("c1")
    run("c2")  # fresh checkpoint replays batch 0: fold must be skipped
    latest = spark.read.parquet(f"{state}/counts/v0")
    got = {r["__tok__"]: r["__cp__"] for r in latest.collect()}
    assert got == {"alpha": 1, "beta": 1}


def test_stream_kl_restart_continues_and_prunes_versions(spark, tmp_path):
    ref = _ref(spark)
    src = str(tmp_path / "src")
    spark.createDataFrame([("alpha",)], "text string").coalesce(
        1
    ).write.parquet(f"{src}/b0")
    state = str(tmp_path / "state")

    def run():
        q = stream_unigram_drift(
            read_stream(spark, src + "/*", "text string", max_files_per_trigger=1),
            "text",
            ref,
            state,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    run()
    for b, text in ((1, "beta"), (2, "alpha gamma")):
        spark.createDataFrame([(text,)], "text string").coalesce(
            1
        ).write.parquet(f"{src}/b{b}")
    run()
    counts = {
        r["__tok__"]: r["__cp__"]
        for r in spark.read.parquet(f"{state}/counts/v2").collect()
    }
    assert counts == {"alpha": 2, "beta": 1, "gamma": 1}
    import os

    versions = sorted(
        d for d in os.listdir(f"{state}/counts") if d.startswith("v")
    )
    # older-than-previous versions pruned best-effort
    assert "v0" not in versions and versions[-1] == "v2"
