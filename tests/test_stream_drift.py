"""stream_histogram_drift: accumulated streaming TV drift == the batch
histogram_tv_drift on the same rows, pinned over real micro-batches."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.profile import histogram_tv_drift
from pangool_spark.streaming.ops import read_stream, stream_histogram_drift


def _ref(spark):
    return spark.createDataFrame([(i % 50,) for i in range(200)], "v BIGINT")


def test_stream_tv_equals_batch(spark, tmp_path):
    ref = _ref(spark)
    rows = [(i * 7 % 90,) for i in range(60)]
    src = str(tmp_path / "src")
    # 3 micro-batches of 20 rows
    for b in range(3):
        spark.createDataFrame(
            rows[b * 20 : (b + 1) * 20], "v BIGINT"
        ).coalesce(1).write.parquet(f"{src}/b{b}")
    state = str(tmp_path / "state")
    q = stream_histogram_drift(
        read_stream(spark, src + "/*", "v BIGINT", max_files_per_trigger=1),
        "v",
        ref,
        state,
        bin_width=10,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    tv_rows = spark.read.parquet(f"{state}/_TV").orderBy("batch_id").collect()
    assert len(tv_rows) == 3
    # monotone accumulation: every batch's n_stream grows
    assert [r["n_stream"] for r in tv_rows] == [20, 40, 60]
    # final accumulated TV == batch recompute over ALL rows
    all_df = spark.createDataFrame(rows, "v BIGINT")
    [expected] = histogram_tv_drift(all_df, ref, "v", bin_width=10).collect()
    last = tv_rows[-1]
    assert last["tv"] == pytest.approx(expected["tv"], abs=0.0)
    assert last["n_ref"] == 200


def test_stream_tv_state_survives_restart(spark, tmp_path):
    ref = _ref(spark)
    src = str(tmp_path / "src")
    spark.createDataFrame([(1,), (2,)], "v BIGINT").coalesce(1).write.parquet(
        f"{src}/b0"
    )
    state = str(tmp_path / "state")

    def run():
        q = stream_histogram_drift(
            read_stream(spark, src + "/*", "v BIGINT", max_files_per_trigger=1),
            "v",
            ref,
            state,
            bin_width=10,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    run()
    spark.createDataFrame([(3,), (4,)], "v BIGINT").coalesce(1).write.parquet(
        f"{src}/b1"
    )
    run()  # restart picks up only the new file; standing histogram folds
    tv_rows = spark.read.parquet(f"{state}/_TV").orderBy("n_stream").collect()
    assert tv_rows[-1]["n_stream"] == 4


def test_stream_tv_replay_is_idempotent(spark, tmp_path):
    """Regression (ADVICE r09): replaying an already-folded micro-batch
    (retry after a failure between the histogram overwrite and the
    checkpoint commit) must NOT double-count its rows or append a
    duplicate TV row."""
    ref = _ref(spark)
    src = str(tmp_path / "src")
    spark.createDataFrame([(1,), (2,)], "v BIGINT").coalesce(1).write.parquet(
        f"{src}/b0"
    )
    state = str(tmp_path / "state")

    def run(ckpt):
        q = stream_histogram_drift(
            read_stream(spark, src + "/*", "v BIGINT", max_files_per_trigger=1),
            "v",
            ref,
            state,
            bin_width=10,
            checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination(120)

    run("ckpt1")
    # fresh checkpoint + same state dir == the engine replaying batch 0
    # against state that already folded it
    run("ckpt2")
    tv_rows = spark.read.parquet(f"{state}/_TV").collect()
    assert len(tv_rows) == 1  # rewritten, not duplicated
    assert tv_rows[0]["n_stream"] == 2  # not double-counted
    hist = spark.read.parquet(f"{state}/hist")
    assert hist.agg(F.sum("n")).collect()[0][0] == 2


def test_stream_tv_guards(spark, tmp_path):
    ref = _ref(spark)
    src = str(tmp_path / "src")
    spark.createDataFrame([(1,)], "v BIGINT").write.parquet(f"{src}/b0")
    stream = read_stream(spark, src + "/*", "v BIGINT")
    with pytest.raises(ValueError, match="bin_width"):
        stream_histogram_drift(stream, "v", ref, str(tmp_path / "s"), bin_width=0)
    bad_ref = spark.createDataFrame([(1.5,)], "v DOUBLE")
    with pytest.raises(ValueError, match="integer-typed"):
        stream_histogram_drift(
            stream, "v", bad_ref, str(tmp_path / "s"), bin_width=1
        )
