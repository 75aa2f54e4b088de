"""End-to-end parity with the reference's remaining example jobs
(FIXTURES.md §4, §6, §9 — moving average, top-N hashtags, naive bayes)."""

import math

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators import moving_average, top_k
from pangool_spark.operators.text import tokenize


# --- MovingAverage (EX/movingaverage/MovingAverage.java:51-137) ------------
def test_moving_average_trailing_days_with_gaps(spark):
    # url visits with a gap: the 3-day range window shrinks over missing days
    rows = [
        ("u1", "2024-01-01", 10),
        ("u1", "2024-01-02", 20),
        ("u1", "2024-01-03", 30),
        ("u1", "2024-01-06", 60),  # gap: 04,05 missing → window = {06} only
        ("u2", "2024-01-01", 5),
    ]
    df = spark.createDataFrame(rows, "url STRING, date STRING, visits INT").withColumn(
        "day", F.datediff(F.col("date").cast("date"), F.lit("1970-01-01").cast("date"))
    )
    out = moving_average(df, ["url"], "day", "visits", window_size=3)
    got = {(r.url, r.date): r.moving_avg for r in out.collect()}
    assert got[("u1", "2024-01-01")] == pytest.approx(10.0)
    assert got[("u1", "2024-01-02")] == pytest.approx(15.0)
    assert got[("u1", "2024-01-03")] == pytest.approx(20.0)
    assert got[("u1", "2024-01-06")] == pytest.approx(60.0)  # range frame pruned the gap
    assert got[("u2", "2024-01-01")] == pytest.approx(5.0)


# --- TopNHashTags (EX/topnhashtags/TopNHashTags.java:55-169) ----------------
def test_top_n_hashtags_per_location_date(spark):
    rows = [
        ("madrid", "2024-01-01", "spark", 5),
        ("madrid", "2024-01-01", "flink", 3),
        ("madrid", "2024-01-01", "duck", 1),
        ("madrid", "2024-01-02", "spark", 2),
        ("paris", "2024-01-01", "wine", 9),
    ]
    df = spark.createDataFrame(rows, "location STRING, date STRING, hashtag STRING, count INT")
    # group-sum then top-2 per (location, date) — the reference's heap flush
    counts = df.groupBy("location", "date", "hashtag").agg(F.sum("count").alias("cnt"))
    out = top_k(
        counts, ["location", "date"], [F.col("cnt").desc(), F.col("hashtag").asc()], 2
    )
    got = sorted((r.location, r.date, r.hashtag) for r in out.collect())
    assert got == [
        ("madrid", "2024-01-01", "flink"),
        ("madrid", "2024-01-01", "spark"),
        ("madrid", "2024-01-02", "spark"),
        ("paris", "2024-01-01", "wine"),
    ]


# --- NaiveBayes two-phase pipeline (EX/naivebayes/*, FIXTURES §9) ----------
def test_naive_bayes_train_then_classify(spark):
    train = spark.createDataFrame(
        [
            ("SPAM", "buy cheap pills now"),
            ("SPAM", "cheap cheap offer"),
            ("HAM", "meeting notes attached"),
            ("HAM", "lunch meeting tomorrow"),
        ],
        "category STRING, doc STRING",
    )
    # phase 1: model = per-(category, word) counts written as a tuple file
    model = (
        tokenize(train, text_col="doc", out_col="word")
        .groupBy("category", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = {r.category: r.total for r in model.groupBy("category").agg(F.sum("cnt").alias("total")).collect()}
    vocab = model.select("word").distinct().count()
    model_rows = [(r.category, r.word, r.cnt) for r in model.collect()]

    # phase 2: map-only scoring against the broadcast model (the reference
    # loads the tuple file in setup(); here a broadcast dict)
    bc = spark.sparkContext.broadcast(
        ({(c, w): n for c, w, n in model_rows}, totals, vocab)
    )

    def classify_score(tokens, category):
        counts, tot, v = bc.value
        return sum(
            math.log((counts.get((category, t), 0) + 1) / (tot[category] + v)) for t in tokens
        )

    tests = spark.createDataFrame(
        [("cheap pills offer",), ("notes for the meeting",)], "value STRING"
    )
    toks = tests.select(
        "value", F.filter(F.split("value", r"\s+"), lambda t: t != "").alias("tokens")
    ).collect()
    preds = {
        r.value: max(("SPAM", "HAM"), key=lambda c: classify_score(r.tokens, c)) for r in toks
    }
    assert preds["cheap pills offer"] == "SPAM"
    assert preds["notes for the meeting"] == "HAM"
