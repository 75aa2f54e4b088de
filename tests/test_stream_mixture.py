"""stream_mixture_monitor: the live data-recipe report after batch N ==
mixture_plan over the union of batches 0..N, pinned over real
micro-batches (structural parity via the shared plan_from_counts)."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.sampling import mixture_plan
from pangool_spark.streaming.ops import read_stream, stream_mixture_monitor

_W = {"a": 0.5, "b": 0.2}
_BUDGET = 1000


def _rows(n0, n1):
    return [
        ("a" if i % 3 else "b", 10 + (i % 7)) for i in range(n0, n1)
    ]


def test_stream_plan_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    for b in range(3):
        spark.createDataFrame(
            _rows(b * 20, (b + 1) * 20), "source STRING, toks BIGINT"
        ).coalesce(1).write.parquet(f"{src}/b{b}")
    state = str(tmp_path / "state")
    q = stream_mixture_monitor(
        read_stream(
            spark, src + "/*", "source STRING, toks BIGINT",
            max_files_per_trigger=1,
        ),
        "source",
        "toks",
        _W,
        _BUDGET,
        state,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    plans = spark.read.parquet(f"{state}/_PLAN")
    batch_ids = sorted(
        r["batch_id"] for r in plans.select("batch_id").distinct().collect()
    )
    assert batch_ids == [0, 1, 2]
    # after every prefix of batches, the emitted report equals the batch
    # mixture_plan over exactly those rows — bit-exact, all columns
    for upto in batch_ids:
        got = sorted(
            map(
                tuple,
                plans.filter(F.col("batch_id") == upto)
                .drop("batch_id")
                .collect(),
            )
        )
        all_df = spark.createDataFrame(
            _rows(0, (upto + 1) * 20), "source STRING, toks BIGINT"
        )
        want = sorted(
            map(tuple, mixture_plan(all_df, "source", "toks", _W, _BUDGET).collect())
        )
        assert got == want, f"plan diverges at batch {upto}"


def test_stream_plan_deficit_progression(spark, tmp_path):
    """The monitor's point: deficits shrink as batches arrive."""
    src = str(tmp_path / "src")
    for b in range(2):
        spark.createDataFrame(
            [("a", 100)] * 3, "source STRING, toks BIGINT"
        ).coalesce(1).write.parquet(f"{src}/b{b}")
    state = str(tmp_path / "state")
    q = stream_mixture_monitor(
        read_stream(
            spark, src + "/*", "source STRING, toks BIGINT",
            max_files_per_trigger=1,
        ),
        "source", "toks", {"a": 1.0}, 1000, state,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    plans = spark.read.parquet(f"{state}/_PLAN")
    by_batch = {
        r["batch_id"]: r for r in plans.filter(F.col("source") == "a").collect()
    }
    assert by_batch[0]["avail_tokens"] == 300
    assert by_batch[0]["deficit_tokens"] == 700
    assert by_batch[1]["avail_tokens"] == 600
    assert by_batch[1]["deficit_tokens"] == 400


def test_stream_plan_validates_budget(spark, tmp_path):
    with pytest.raises(ValueError, match="budget_tokens"):
        stream_mixture_monitor(
            None, "source", "toks", _W, 0, str(tmp_path / "s")
        )
