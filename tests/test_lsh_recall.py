"""lsh_recall_eval: the sketch-vs-truth calibration report."""

import pytest
from pyspark.sql import functions as F


def test_lsh_recall_perfect_on_exact_dups(spark):
    from pangool_spark.operators.dedup import lsh_recall_eval

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, base), (2, base), (3, "totally different words here now ok yes")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    [r] = lsh_recall_eval(df, threshold=0.9).collect()
    assert (r["n_true"], r["n_reported"], r["n_hit"]) == (1, 1, 1)
    assert r["precision"] == 1.0 and r["recall"] == 1.0


def test_lsh_recall_counts_misses_and_false_positives(spark):
    from pangool_spark.operators.dedup import lsh_recall_eval

    # moderately similar pair: jaccard ~0.5 — near the 16-band S-curve
    # knee for 64 hashes, where the estimate can disagree with truth;
    # whatever happens, the report's algebra must hold
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    b = "w1 w2 w3 w4 w5 w6 w7 w8 x9 x10 x11 x12"
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    [r] = lsh_recall_eval(df, threshold=0.4).collect()
    assert r["n_hit"] <= min(r["n_true"], r["n_reported"])
    if r["n_reported"]:
        assert r["precision"] == pytest.approx(r["n_hit"] / r["n_reported"])
    if r["n_true"]:
        assert r["recall"] == pytest.approx(r["n_hit"] / r["n_true"])


def test_lsh_recall_empty_truth_null_metrics(spark):
    from pangool_spark.operators.dedup import lsh_recall_eval

    rows = [(1, "aa bb cc dd ee"), (2, "ff gg hh ii jj")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    [r] = lsh_recall_eval(df, threshold=0.9).collect()
    assert (r["n_true"], r["n_reported"], r["n_hit"]) == (0, 0, 0)
    assert r["precision"] is None and r["recall"] is None
