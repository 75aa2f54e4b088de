"""stream_confusion_monitor: the live classification report after batch
N == classification_report over the union of batches 0..N, pinned over
real micro-batches (structural parity via the shared
confusion_report_from_cells), plus replay idempotence."""

from pyspark.sql import functions as F

from pangool_spark.operators.ml import classification_report
from pangool_spark.streaming.ops import read_stream, stream_confusion_monitor

_CLASSES = ["x", "y", "z"]


def _rows(n0, n1):
    # deterministic pseudo-classifier: right 2 of 3 times, the rest a
    # rotating wrong class; exercises off-diagonal cells in every batch
    out = []
    for i in range(n0, n1):
        label = _CLASSES[i % 3]
        pred = label if i % 3 != 1 else _CLASSES[(i + 1) % 3]
        out.append((label, pred))
    return out


def test_stream_report_equals_batch_per_prefix(spark, tmp_path):
    src = str(tmp_path / "src")
    for b in range(3):
        spark.createDataFrame(
            _rows(b * 30, (b + 1) * 30), "label STRING, pred STRING"
        ).coalesce(1).write.parquet(f"{src}/b{b}")
    state = str(tmp_path / "state")
    q = stream_confusion_monitor(
        read_stream(
            spark, src + "/*", "label STRING, pred STRING",
            max_files_per_trigger=1,
        ),
        "label",
        "pred",
        state,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    reports = spark.read.parquet(f"{state}/_REPORT")
    batch_ids = sorted(
        r["batch_id"] for r in reports.select("batch_id").distinct().collect()
    )
    assert batch_ids == [0, 1, 2]
    for upto in batch_ids:
        got = sorted(
            map(
                tuple,
                reports.filter(F.col("batch_id") == upto)
                .drop("batch_id")
                .collect(),
            )
        )
        all_df = spark.createDataFrame(
            _rows(0, (upto + 1) * 30), "label STRING, pred STRING"
        )
        want = sorted(
            map(tuple, classification_report(all_df, "label", "pred").collect())
        )
        assert got == want, f"report diverges at batch {upto}"


def test_stream_report_replay_does_not_double_count(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        _rows(0, 30), "label STRING, pred STRING"
    ).coalesce(1).write.parquet(f"{src}/b0")
    state = str(tmp_path / "state")

    def run():
        q = stream_confusion_monitor(
            read_stream(
                spark, src + "/*", "label STRING, pred STRING",
                max_files_per_trigger=1,
            ),
            "label",
            "pred",
            state,
            # NO checkpoint: a second run replays batch 0 from scratch —
            # the idempotent-by-batch_id guard must skip the re-fold
        )
        q.awaitTermination(120)

    run()
    run()
    cells = spark.read.parquet(f"{state}/cells")
    total = cells.agg(F.sum("n")).collect()[0][0]
    assert total == 30  # folded once, not twice
    want = sorted(
        map(
            tuple,
            classification_report(
                spark.createDataFrame(_rows(0, 30), "label STRING, pred STRING"),
                "label",
                "pred",
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            spark.read.parquet(f"{state}/_REPORT")
            .filter(F.col("batch_id") == 0)
            .drop("batch_id")
            .collect(),
        )
    )
    assert got == want
