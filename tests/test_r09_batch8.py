"""Round-9 batch-8 operators: fd_violations, histogram_tv_drift,
collocations."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# fd_violations


def test_fd_violations_finds_multivalued_keys(spark):
    from pangool_spark.operators.profile import fd_violations

    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (3, None), (3, "z")],
        ["k", "v"],
    )
    got = {r["k"]: (r["n_rows"], r["n_rhs_values"]) for r in fd_violations(df, ["k"], "v").collect()}
    # key 1 maps to {x, y}; key 3 maps to {NULL, z} (NULL is a value);
    # key 2 holds the FD and is absent
    assert got == {1: (3, 2), 3: (2, 2)}


def test_fd_violations_top_k_orders_worst_first(spark):
    from pangool_spark.operators.profile import fd_violations

    rows = [(1, v) for v in "abc"] + [(2, v) for v in "ab"] + [(3, v) for v in "abcd"]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = fd_violations(df, ["k"], "v", top_k=2).collect()
    assert [r["k"] for r in out] == [3, 1]


# ---------------------------------------------------------------------------
# histogram_tv_drift


def test_tv_drift_identical_zero_disjoint_one(spark):
    from pangool_spark.operators.profile import histogram_tv_drift

    a = spark.createDataFrame([(i,) for i in range(100)], "v BIGINT")
    [r] = histogram_tv_drift(a, a, "v", bin_width=10).collect()
    assert r["tv"] == pytest.approx(0.0)
    b = spark.createDataFrame([(i + 1000,) for i in range(50)], "v BIGINT")
    [r2] = histogram_tv_drift(a, b, "v", bin_width=10).collect()
    assert r2["tv"] == pytest.approx(1.0)
    assert (r2["n_a"], r2["n_b"]) == (100, 50)


def test_tv_drift_matches_numpy(spark):
    import numpy as np

    from pangool_spark.operators.profile import histogram_tv_drift

    rng = np.random.RandomState(5)
    xa = rng.randint(0, 200, size=300)
    xb = rng.randint(50, 250, size=400)
    a = spark.createDataFrame([(int(v),) for v in xa], "v BIGINT").repartition(4)
    b = spark.createDataFrame([(int(v),) for v in xb], "v BIGINT").repartition(3)
    [r] = histogram_tv_drift(a, b, "v", bin_width=25).collect()
    bins = range(0, 11)
    pa = np.array([np.sum(xa // 25 == i) for i in bins]) / len(xa)
    pb = np.array([np.sum(xb // 25 == i) for i in bins]) / len(xb)
    assert r["tv"] == pytest.approx(0.5 * np.abs(pa - pb).sum(), rel=1e-12)


def test_tv_drift_empty_side_raises(spark):
    from pangool_spark.operators.profile import histogram_tv_drift

    a = spark.createDataFrame([(1,)], "v BIGINT")
    empty = a.filter(F.col("v") < 0)
    with pytest.raises(Exception, match="empty side"):
        histogram_tv_drift(a, empty, "v", bin_width=1).collect()


def test_tv_drift_rejects_fractional(spark):
    from pangool_spark.operators.profile import histogram_tv_drift

    a = spark.createDataFrame([(1.5,)], "v DOUBLE")
    with pytest.raises(ValueError, match="integer-typed"):
        histogram_tv_drift(a, a, "v", bin_width=1)


# ---------------------------------------------------------------------------
# collocations


def test_collocations_ranks_exclusive_pair_first(spark):
    from pangool_spark.operators.text import collocations

    # 'new york' always together; 'the' is everywhere
    docs = [
        (1, "the new york times the story"),
        (2, "the new york journal the story"),
        (3, "the story of the city"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = collocations(df, window=1, min_count=2, top_k=3).collect()
    top = (out[0]["term_a"], out[0]["term_b"])
    assert top == ("new", "york")
    # lift of the top pair must exceed any pair involving 'the'
    the_lifts = [r["lift"] for r in out if "the" in (r["term_a"], r["term_b"])]
    assert all(out[0]["lift"] > lv for lv in the_lifts)


def test_collocations_min_count_and_top_k(spark):
    from pangool_spark.operators.text import collocations

    df = spark.createDataFrame([(1, "a b a b a b c d")], ["doc_id", "text"])
    out = collocations(df, window=1, min_count=3, top_k=1).collect()
    assert len(out) == 1
    assert (out[0]["term_a"], out[0]["term_b"]) == ("a", "b")
    with pytest.raises(ValueError, match="top_k"):
        collocations(df, top_k=0)
