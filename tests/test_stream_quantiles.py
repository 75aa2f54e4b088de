"""stream_quantile_sketch: accumulated streaming quantile brackets ==
the batch histogram_quantile_sketch on the same rows, pinned over real
micro-batches; replay of a folded batch never double-counts."""

from pyspark.sql import functions as F

from pangool_spark.operators.sketch import histogram_quantile_sketch
from pangool_spark.streaming.ops import read_stream, stream_quantile_sketch

QS = (0.5, 0.95, 0.99)


def _rows():
    return [(i * 13 % 997,) for i in range(90)]


def test_stream_quantiles_equal_batch_per_prefix(spark, tmp_path):
    rows = _rows()
    src = str(tmp_path / "src")
    for b in range(3):
        spark.createDataFrame(
            rows[b * 30 : (b + 1) * 30], "v BIGINT"
        ).coalesce(1).write.parquet(f"{src}/b{b}")
    state = str(tmp_path / "state")
    q = stream_quantile_sketch(
        read_stream(spark, src + "/*", "v BIGINT", max_files_per_trigger=1),
        "v",
        state,
        bin_width=25,
        quantiles=QS,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = spark.read.parquet(f"{state}/_Q")
    assert sorted(set(r["batch_id"] for r in got.select("batch_id").collect())) == [0, 1, 2]
    # every batch's report == batch operator on that PREFIX of the rows
    for b in range(3):
        prefix = spark.createDataFrame(rows[: (b + 1) * 30], "v BIGINT")
        expected = sorted(
            map(tuple, histogram_quantile_sketch(prefix, "v", 25, QS).collect())
        )
        actual = sorted(
            map(
                tuple,
                got.filter(F.col("batch_id") == b)
                .select("q", "n", "bin", "est_lo", "est_hi")
                .collect(),
            )
        )
        assert actual == expected, f"batch {b}"


def test_stream_quantiles_replay_is_idempotent(spark, tmp_path):
    """Re-running from a fresh checkpoint over the same single file (the
    worst-case replay) must not double-count the standing histogram."""
    rows = _rows()[:30]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "v BIGINT").coalesce(1).write.parquet(
        f"{src}/b0"
    )
    state = str(tmp_path / "state")

    def run(ckpt):
        q = stream_quantile_sketch(
            read_stream(spark, src + "/*", "v BIGINT", max_files_per_trigger=1),
            "v",
            state,
            bin_width=25,
            quantiles=QS,
            checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination(120)

    run("ckpt1")
    run("ckpt2")  # fresh checkpoint → batch_id 0 replays against state

    hist = spark.read.parquet(f"{state}/hist")
    assert hist.agg(F.sum("cnt")).collect()[0][0] == 30  # not 60
    batch = spark.createDataFrame(rows, "v BIGINT")
    expected = sorted(
        map(tuple, histogram_quantile_sketch(batch, "v", 25, QS).collect())
    )
    actual = sorted(
        map(
            tuple,
            spark.read.parquet(f"{state}/_Q")
            .filter(F.col("batch_id") == 0)
            .select("q", "n", "bin", "est_lo", "est_hi")
            .collect(),
        )
    )
    assert actual == expected


def test_stream_quantiles_validation(spark, tmp_path):
    import pytest

    s = read_stream(spark, str(tmp_path) + "/*", "v DOUBLE")
    with pytest.raises(ValueError):
        stream_quantile_sketch(s, "v", str(tmp_path / "st"), bin_width=10)
    s2 = read_stream(spark, str(tmp_path) + "/*", "v BIGINT")
    with pytest.raises(ValueError):
        stream_quantile_sketch(s2, "v", str(tmp_path / "st"), bin_width=0)
    with pytest.raises(ValueError):
        stream_quantile_sketch(
            s2, "v", str(tmp_path / "st"), bin_width=10, quantiles=(1.5,)
        )
