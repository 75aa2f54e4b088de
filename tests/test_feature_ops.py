"""temporal_split / hashed_features / target_encode: python-reference
parity, null semantics, guards."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.sampling import temporal_split
from pangool_spark.operators.stats import target_encode
from pangool_spark.operators.text import hashed_features


def test_temporal_split_labels(spark):
    rows = [
        (1, "2024-01-10 00:00:00"),
        (2, "2024-01-19 23:59:59"),
        (3, "2024-01-20 00:00:00"),  # boundary -> embargo
        (4, "2024-01-22 23:59:59"),  # inside embargo
        (5, "2024-01-23 00:00:00"),  # embargo end -> test
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        r["id"]: r["split"]
        for r in temporal_split(df, "ts", "2024-01-20 00:00:00", "3 days").collect()
    }
    assert got == {
        1: "train", 2: "train", 3: "embargo", 4: "embargo", 5: "test", 6: None,
    }


def h31(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) & 0x7FFFFFFF


def test_hashed_features_match_reference_and_keep_zeros(spark):
    texts = {1: "alpha beta alpha gamma", 2: "beta beta", 3: ""}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    dim = 16
    got = {}
    for r in hashed_features(df, dim=dim).collect():
        got[(r["doc_id"], r["idx"])] = r["value"]
    want = {}
    for d, t in texts.items():
        for tok in t.lower().split():
            h = h31(tok)
            sign = 1 if (h // dim) % 2 == 0 else -1
            key = (d, h % dim)
            want[key] = want.get(key, 0) + sign
    assert got == want  # zero-cancelled features kept on BOTH sides


def test_hashed_features_guard(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="dim"):
        hashed_features(df, dim=0)


def make_orders(spark):
    rows = [
        ("A", 100), ("A", 200), ("A", None),
        ("B", 1000),
        (None, 50), (None, 150),
    ]
    return spark.createDataFrame(rows, "cat string, y bigint")


def py_te(rows, w=20.0):
    rows = [(c, y) for c, y in rows if y is not None]
    mu = float(sum(y for _c, y in rows)) / float(len(rows))
    agg = {}
    for c, y in rows:
        n, s = agg.get(c, (0, 0))
        agg[c] = (n + 1, s + y)
    return mu, {c: (float(s) + w * mu) / (float(n) + w) for c, (n, s) in agg.items()}


def test_target_encode_per_category(spark):
    df = make_orders(spark)
    got = {r["cat"]: (r["n"], r["sum"], r["te"]) for r in
           target_encode(df, "cat", "y").collect()}
    mu, want = py_te([(c, y) for c, y in
                      [("A", 100), ("A", 200), ("A", None), ("B", 1000),
                       (None, 50), (None, 150)]])
    assert set(got) == {"A", "B", None}  # NULL category is a real group
    for c in got:
        assert got[c][2] == want[c]
    assert got["A"][:2] == (2, 300)


def test_target_encode_loo(spark):
    rows = [("A", 100), ("A", 200), ("B", 1000), (None, 50)]
    df = make_orders(spark).filter(F.col("y").isNotNull()).limit(0).union(
        spark.createDataFrame(rows, "cat string, y bigint")
    )
    w = 20.0
    out = target_encode(df, "cat", "y", loo=True).collect()
    ys = [y for _c, y in rows]
    mu = float(sum(ys)) / len(ys)
    agg = {}
    for c, y in rows:
        n, s = agg.get(c, (0, 0))
        agg[c] = (n + 1, s + y)
    for r in out:
        n, s = agg[r["cat"]]
        want = (float(s - r["y"]) + w * mu) / (float(n - 1) + w)
        assert r["te"] == want


def test_target_encode_type_guard(spark):
    df = spark.createDataFrame([("A", 1.5)], "cat string, y double")
    with pytest.raises(ValueError, match="integer-typed"):
        target_encode(df, "cat", "y")
    with pytest.raises(ValueError, match="prior_weight"):
        target_encode(make_orders(spark), "cat", "y", prior_weight=-1)
