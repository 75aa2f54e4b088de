"""stream_upsert: stream-applied snapshot == batch recompute, deletes
remove keys, within-batch last-writer-wins, versioned pointer flip."""

from pyspark.sql import functions as F

from pangool_spark.operators.upsert import keep_latest
from pangool_spark.streaming import read_stream
from pangool_spark.streaming.ops import read_upsert_snapshot, stream_upsert

RAW = "k LONG, v STRING, ver LONG, is_delete BOOLEAN"

B1 = [
    (1, "a0", 1, False),
    (1, "a1", 2, False),  # same key twice in one batch: ver 2 wins
    (2, "b0", 1, False),
    (3, "c0", 1, False),
]
B2 = [
    (2, "b1", 3, False),   # update
    (3, None, 4, True),    # delete key 3
    (4, "d0", 1, False),   # insert
]


def _write(spark, rows, path):
    spark.createDataFrame(rows, RAW).write.parquet(path)


def _run_stream(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        _write(spark, rows, f"{src}/b{i}")
    state = str(tmp_path / "state")
    q = stream_upsert(
        read_stream(spark, src + "/*", RAW, max_files_per_trigger=1),
        keys=["k"],
        order_by=["ver"],
        state_dir=state,
        delete_col="is_delete",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    return state


def batch_reference(spark, rows):
    df = spark.createDataFrame(rows, RAW)
    latest = keep_latest(df, ["k"], ["ver"])
    return {
        r["k"]: (r["v"], r["ver"])
        for r in latest.filter(~F.col("is_delete")).collect()
    }


def test_stream_equals_batch_recompute(spark, tmp_path):
    state = _run_stream(spark, tmp_path, [B1, B2])
    snap = read_upsert_snapshot(spark, state)
    got = {r["k"]: (r["v"], r["ver"]) for r in snap.collect()}
    assert got == batch_reference(spark, B1 + B2)
    assert got == {1: ("a1", 2), 2: ("b1", 3), 4: ("d0", 1)}  # 3 deleted


def test_single_batch_bootstrap_and_versioning(spark, tmp_path):
    import os

    state = _run_stream(spark, tmp_path, [B1])
    snap = read_upsert_snapshot(spark, state)
    got = {r["k"]: r["v"] for r in snap.collect()}
    assert got == {1: "a1", 2: "b0", 3: "c0"}
    assert os.path.exists(os.path.join(state, "_LATEST"))


def test_old_versions_pruned(spark, tmp_path):
    import os

    state = _run_stream(spark, tmp_path, [B1, B2, [(5, "e0", 1, False)]])
    versions = [d for d in os.listdir(state) if d.startswith("v")]
    assert len(versions) <= 2  # keep_versions default
    snap = read_upsert_snapshot(spark, state)
    assert 5 in {r["k"] for r in snap.collect()}


def test_guards(spark):
    import pytest

    df = spark.createDataFrame([], RAW)
    with pytest.raises(ValueError, match="keys"):
        stream_upsert(df, [], ["ver"], "/tmp/x")
    with pytest.raises(ValueError, match="order_by"):
        stream_upsert(df, ["k"], [], "/tmp/x")


def test_out_of_order_batches_never_clobber(spark, tmp_path):
    # the newer version arrives in the EARLIER batch; the stale update
    # and a stale resurrect-attempt after a tombstone arrive later
    b1 = [(1, "new", 10, False), (2, "x", 5, True)]  # tombstone ver 5
    b2 = [(1, "stale", 3, False), (2, "ghost", 4, False)]
    state = _run_stream(spark, tmp_path, [b1, b2])
    snap = read_upsert_snapshot(spark, state)
    got = {r["k"]: (r["v"], r["ver"]) for r in snap.collect()}
    assert got == {1: ("new", 10)}  # stale update lost, key 2 stays dead
    assert got == batch_reference(spark, b1 + b2)
