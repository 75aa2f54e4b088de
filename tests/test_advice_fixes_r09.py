"""Regression tests for round-8 advisor findings (ADVICE.md r08).

1. stream_cms: a corrupt/partially-written standing sketch must FAIL the
   micro-batch (so Structured Streaming retries), never silently reset
   the accumulated counts to the current batch alone.
2. stream_upsert: crash-recovery replay of a batch whose pointer already
   flipped must not read-and-overwrite the same version dir (a wedge —
   Spark aborts self-overwriting reads); replay is a checked no-op.
3. item_cf: non-integer rating columns raise (exact-sum contract),
   instead of a silent bigint truncation (4.5 -> 4) skewing cosines.
4. stream_ewma: key schema follows the input type — string keys work on
   the streaming path exactly like the batch twin.
5. point_in_time_join: prefixed validity columns are attached as the
   docstring promises, NULL-guarded like the attrs.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- stream_cms
def test_stream_cms_corrupt_state_fails_batch(spark, tmp_path):
    from pangool_spark.streaming import read_stream
    from pangool_spark.streaming.ops import stream_cms

    src = str(tmp_path / "src")
    spark.createDataFrame([(i, f"w{i % 3}") for i in range(20)],
                          "id LONG, word STRING").write.parquet(src + "/b0")
    state = tmp_path / "state"
    state.mkdir()
    # state dir EXISTS but holds garbage — a partially-written sketch.
    (state / "part-00000.parquet").write_bytes(b"not parquet at all")
    q = stream_cms(
        read_stream(spark, src + "/*", "id LONG, word STRING",
                    max_files_per_trigger=1),
        "word",
        str(state),
        width=64,
        depth=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise RuntimeError(q.exception().desc)
    # the garbage state was NOT clobbered by a silent reset
    assert (state / "part-00000.parquet").read_bytes() == b"not parquet at all"


def test_stream_cms_first_batch_then_merge(spark, tmp_path):
    from pangool_spark.operators.sketch import cms_estimate, count_min_sketch
    from pangool_spark.streaming import read_stream
    from pangool_spark.streaming.ops import stream_cms

    src = str(tmp_path / "src")
    b0 = [(i, "alpha") for i in range(5)] + [(100 + i, "beta") for i in range(3)]
    b1 = [(200 + i, "alpha") for i in range(7)]
    spark.createDataFrame(b0, "id LONG, word STRING").write.parquet(src + "/b0")
    spark.createDataFrame(b1, "id LONG, word STRING").write.parquet(src + "/b1")
    state = str(tmp_path / "state")  # does NOT exist: genuine first batch
    q = stream_cms(
        read_stream(spark, src + "/*", "id LONG, word STRING",
                    max_files_per_trigger=1),
        "word",
        state,
        width=64,
        depth=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert q.exception() is None
    standing = spark.read.parquet(state)
    probes = spark.createDataFrame([("alpha",), ("beta",)], "word STRING")
    got = {r.word: r.est_count
           for r in cms_estimate(standing, probes, "word", 64, 2, "fast").collect()}
    batch_all = count_min_sketch(
        spark.createDataFrame(b0 + b1, "id LONG, word STRING"),
        "word", 64, 2, "fast")
    want = {r.word: r.est_count
            for r in cms_estimate(batch_all, probes, "word", 64, 2, "fast").collect()}
    assert got == want  # stream-maintained grid == batch rebuild


# ------------------------------------------------------------- stream_upsert
def test_stream_upsert_replay_after_pointer_flip(spark, tmp_path):
    """Simulate the crash window: checkpoint lost AFTER the pointer flip.
    The replayed batch sees pointer == v{batch_id} and must skip (state is
    final), not read-and-overwrite the same directory."""
    import shutil

    from pangool_spark.streaming import read_stream
    from pangool_spark.streaming.ops import read_upsert_snapshot, stream_upsert

    src = str(tmp_path / "src")
    rows = [(1, "a", 1, False), (2, "b", 2, False)]
    spark.createDataFrame(
        rows, "k LONG, v STRING, ver LONG, is_delete BOOLEAN"
    ).write.parquet(src + "/b0")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        q = stream_upsert(
            read_stream(spark, src + "/*",
                        "k LONG, v STRING, ver LONG, is_delete BOOLEAN",
                        max_files_per_trigger=1),
            keys=["k"], order_by=["ver"], state_dir=state,
            delete_col="is_delete", checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)
        return q

    q = _run()
    assert q.exception() is None
    # crash simulation: the streaming checkpoint vanishes, the state
    # pointer (already flipped to v0) survives — batch 0 will replay.
    shutil.rmtree(ckpt)
    q2 = _run()
    assert q2.exception() is None  # pre-fix: self-overwrite abort here
    snap = read_upsert_snapshot(spark, state)
    assert {r.k: r.v for r in snap.collect()} == {1: "a", 2: "b"}


# ------------------------------------------------------------------- item_cf
def test_item_cf_rejects_non_integer_ratings(spark):
    from pangool_spark.operators.ml import item_cf

    df = spark.createDataFrame(
        [(1, 10, 4.5), (1, 11, 3.5), (2, 10, 2.0)],
        "u LONG, i LONG, r DOUBLE",
    )
    with pytest.raises(ValueError, match="integer-typed"):
        item_cf(df, "u", "i", "r")


# --------------------------------------------------------------- stream_ewma
def test_stream_ewma_string_key(spark, tmp_path):
    from pangool_spark.operators.windows import ewma
    from pangool_spark.streaming import read_stream
    from pangool_spark.streaming.ops import stream_ewma

    raw = "event_id LONG, ts STRING, user_id STRING, value DOUBLE"
    schema = "event_id LONG, ts TIMESTAMP, user_id STRING, value DOUBLE"
    rows = [
        (1, "2024-01-01 10:00:00", "ann", 10.0),
        (2, "2024-01-01 10:01:00", "ann", 20.0),
        (3, "2024-01-01 10:00:30", "bo", 5.0),
    ]
    src = str(tmp_path / "src")
    (spark.createDataFrame(rows, raw)
     .withColumn("ts", F.col("ts").cast("timestamp"))
     .write.parquet(src + "/b0"))
    out_dir = str(tmp_path / "out")

    def sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_ewma(read_stream(spark, src + "/*", schema))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None  # pre-fix: LongType key schema blew up
    got = {r.user_id: (r.n_obs, r.ewma)
           for r in spark.read.parquet(out_dir).collect()}
    batch = (spark.createDataFrame(rows, raw)
             .withColumn("ts", F.col("ts").cast("timestamp")))
    want = {r.user_id: (r.n_obs, r.ewma)
            for r in ewma(batch, ["user_id"], ["ts", "event_id"], "value",
                          alpha=0.3).collect()}
    assert got == want


# -------------------------------------------------------- point_in_time_join
def test_pit_join_emits_validity_columns(spark):
    from pangool_spark.operators.upsert import point_in_time_join, scd2_history

    def _t(d):
        return dt.datetime(2024, 1, d)

    changes = spark.createDataFrame(
        [(1, _t(1), "bronze"), (1, _t(10), "silver")],
        "user_id LONG, ts TIMESTAMP, tier STRING",
    )
    hist = scd2_history(changes, ["user_id"], "ts", ["tier"])
    probe = spark.createDataFrame(
        [(100, 1, _t(5)), (101, 1, _t(15)), (102, 2, _t(5))],
        "probe_id LONG, user_id LONG, ts TIMESTAMP",
    )
    out = point_in_time_join(probe, hist, ["user_id"])
    assert "pit_valid_from" in out.columns and "pit_valid_to" in out.columns
    rows = {r.probe_id: r for r in out.collect()}
    assert rows[100].pit_tier == "bronze"
    assert rows[100].pit_valid_from == _t(1)
    assert rows[100].pit_valid_to == _t(10)
    assert rows[101].pit_valid_from == _t(10)
    assert rows[101].pit_valid_to is None  # open-ended current version
    # no match: validity NULL-guarded exactly like the attrs
    assert rows[102].pit_tier is None and rows[102].pit_valid_from is None
    # gapped history: an expired match nulls validity too
    gapped = hist.filter("tier = 'bronze'")
    r101 = {r.probe_id: r for r in
            point_in_time_join(probe, gapped, ["user_id"]).collect()}[101]
    assert (r101.pit_tier, r101.pit_valid_from, r101.pit_valid_to) == (
        None, None, None)
