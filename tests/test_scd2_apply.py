"""scd2_apply: exact equivalence with the one-shot rebuild at every
split point of a synthetic change log, new-key insertion, the
late-arrival guard, and closed-version immutability."""

import datetime

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.upsert import scd2_apply, scd2_history


def _log(spark):
    t = lambda d: datetime.datetime(2024, 1, d)  # noqa: E731
    rows = [
        ("u1", t(1), "a"),
        ("u1", t(3), "b"),
        ("u1", t(5), "b"),  # repeated value stays a distinct version
        ("u2", t(2), "x"),
        ("u2", t(6), "y"),
        ("u3", t(7), "q"),  # brand-new key appears late
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, attr string")


def _key(r):
    return (r["k"], r["ts"], r["attr"], r["valid_to"], r["is_current"])


@pytest.mark.parametrize("split_day", [2, 4, 6, 7])
def test_apply_equals_full_rebuild_at_every_split(spark, split_day):
    log = _log(spark)
    cut = datetime.datetime(2024, 1, split_day)
    past = log.filter(F.col("ts") < F.lit(cut))
    batch = log.filter(F.col("ts") >= F.lit(cut))
    applied = scd2_apply(
        scd2_history(past, ["k"], "ts", ["attr"]),
        batch,
        ["k"],
        "ts",
        ["attr"],
    )
    full = scd2_history(log, ["k"], "ts", ["attr"])
    got = sorted(
        [(r["k"], r["valid_from"], r["attr"], r["valid_to"], r["is_current"])
         for r in applied.collect()]
    )
    want = sorted(
        [(r["k"], r["valid_from"], r["attr"], r["valid_to"], r["is_current"])
         for r in full.collect()]
    )
    assert got == want


def test_apply_rejects_late_arrivals(spark):
    log = _log(spark)
    cut = datetime.datetime(2024, 1, 6)
    history = scd2_history(
        log.filter(F.col("ts") < F.lit(cut)), ["k"], "ts", ["attr"]
    )
    late = spark.createDataFrame(
        [("u1", datetime.datetime(2024, 1, 2), "z")],
        "k string, ts timestamp, attr string",
    )
    with pytest.raises(ValueError, match="late-arriving"):
        scd2_apply(history, late, ["k"], "ts", ["attr"]).collect()


def test_closed_versions_pass_through_untouched(spark):
    log = _log(spark)
    cut = datetime.datetime(2024, 1, 6)
    history = scd2_history(
        log.filter(F.col("ts") < F.lit(cut)), ["k"], "ts", ["attr"]
    )
    batch = log.filter(F.col("ts") >= F.lit(cut))
    applied = scd2_apply(history, batch, ["k"], "ts", ["attr"])
    closed_before = {
        (r["k"], r["valid_from"], r["valid_to"])
        for r in history.filter(~F.col("is_current")).collect()
    }
    closed_after = {
        (r["k"], r["valid_from"], r["valid_to"])
        for r in applied.filter(~F.col("is_current")).collect()
    }
    assert closed_before <= closed_after  # old closed rows survive verbatim
