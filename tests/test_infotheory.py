"""infotheory operators vs independent pure-Python references: mutual
information identities (independent → 0, identical → H), WOE/IV against a
hand computation, per-doc token entropy edge cases, and unigram-KL axioms
(identical corpora → exactly 0, KL ≥ 0, asymmetry)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.infotheory import (
    feature_mi_rank,
    mutual_information,
    token_entropy,
    unigram_kl,
    woe_iv,
)


def _ref_entropy(counts):
    n = sum(counts)
    return math.log(n) - sum(c * math.log(c) for c in counts if c > 0) / n


def _ref_mi(pairs):
    from collections import Counter

    cells = Counter(pairs)
    ca = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    return (
        _ref_entropy(list(ca.values()))
        + _ref_entropy(list(cb.values()))
        - _ref_entropy(list(cells.values()))
    )


def test_mutual_information_matches_python_reference(spark):
    rng = random.Random(7)
    pairs = []
    for _ in range(3000):
        a = rng.choice("abcd")
        b = a if rng.random() < 0.5 else rng.choice("abcd")
        pairs.append((a, b))
    df = spark.createDataFrame(pairs, "a string, b string")
    row = mutual_information(df, "a", "b").collect()[0]
    assert row["n"] == 3000 and row["n_a"] == 4 and row["n_b"] == 4
    cells = [(a, b) for a, b in pairs]
    assert row["mi"] == pytest.approx(_ref_mi(cells), abs=1e-5)
    ca = {}
    for a, _ in pairs:
        ca[a] = ca.get(a, 0) + 1
    assert row["h_a"] == pytest.approx(
        _ref_entropy(list(ca.values())), abs=1e-5
    )
    # uncertainty coefficients live in [0, 1]
    assert 0.0 <= row["u_a_given_b"] <= 1.0
    assert 0.0 <= row["u_b_given_a"] <= 1.0


def test_mutual_information_identical_columns_is_entropy(spark):
    rows = [("x",), ("x",), ("y",), ("z",), ("z",), ("z",)]
    df = spark.createDataFrame(rows, "a string").select(
        "a", F.col("a").alias("b")
    )
    row = mutual_information(df, "a", "b").collect()[0]
    # MI(A, A) = H(A); U in both directions = 1
    assert row["mi"] == pytest.approx(row["h_a"], abs=2e-6)
    assert row["u_a_given_b"] == pytest.approx(1.0, abs=2e-6)
    assert row["u_b_given_a"] == pytest.approx(1.0, abs=2e-6)


def test_mutual_information_independent_columns_near_zero(spark):
    # a perfectly balanced product distribution: MI is exactly 0
    rows = [(a, b) for a in "pq" for b in "rs" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    row = mutual_information(df, "a", "b").collect()[0]
    assert abs(row["mi"]) <= 1e-6
    assert row["h_ab"] == pytest.approx(math.log(4), abs=1e-6)


def test_mutual_information_drops_nulls_and_constant_guard(spark):
    rows = [("x", "u"), ("x", None), (None, "v"), ("x", "v")]
    df = spark.createDataFrame(rows, "a string, b string")
    row = mutual_information(df, "a", "b").collect()[0]
    assert row["n"] == 2  # only fully-observed pairs
    # constant A → H(a)=0 → u_a_given_b undefined
    assert row["h_a"] == 0.0 and row["u_a_given_b"] is None


def test_feature_mi_rank_orders_by_informativeness(spark):
    rng = random.Random(3)
    rows = []
    for _ in range(2000):
        lbl = rng.random() < 0.4
        informative = ("T" if lbl else "F") if rng.random() < 0.9 else "?"
        noise = rng.choice("mnop")
        rows.append((informative, noise, lbl))
    df = spark.createDataFrame(rows, "f1 string, f2 string, y boolean")
    out = feature_mi_rank(
        df, [("informative", F.col("f1")), ("noise", F.col("f2"))], F.col("y")
    ).collect()
    assert [r["feature"] for r in out] == ["informative", "noise"]
    assert out[0]["mi"] > out[1]["mi"]
    assert out[0]["u_label"] > 0.5 > out[1]["u_label"]


def _ref_woe_iv(cats, smooth=0.5):
    k = len(cats)
    G = sum(g for g, _ in cats.values())
    B = sum(b for _, b in cats.values())
    out, iv = {}, 0.0
    for c, (g, b) in cats.items():
        pg = (g + smooth) / (G + k * smooth)
        pb = (b + smooth) / (B + k * smooth)
        w = math.log(pg / pb)
        out[c] = w
        iv += (pg - pb) * w
    return out, iv


def test_woe_iv_matches_python_reference(spark):
    cats = {"lo": (10, 90), "mid": (50, 50), "hi": (85, 15), "one": (3, 0)}
    rows = []
    for c, (g, b) in cats.items():
        rows += [(c, True)] * g + [(c, False)] * b
    rows.append(("lo", None))  # NULL label dropped
    df = spark.createDataFrame(rows, "cat string, y boolean")
    got = {r["feature_value"]: r for r in woe_iv(df, "cat", F.col("y")).collect()}
    ref_woe, ref_iv = _ref_woe_iv(cats)
    assert set(got) == set(cats)
    for c in cats:
        assert got[c]["woe"] == pytest.approx(ref_woe[c], abs=1e-8)
        assert got[c]["iv_total"] == pytest.approx(ref_iv, abs=1e-8)
    assert got["lo"]["goods"] == 10 and got["lo"]["bads"] == 90
    # monotone smell: the high-positive category has the largest WOE
    assert got["hi"]["woe"] > got["mid"]["woe"] > got["lo"]["woe"]
    # one-sided category stays finite thanks to smoothing
    assert math.isfinite(got["one"]["woe"])


def test_woe_iv_rejects_nonpositive_smooth(spark):
    df = spark.createDataFrame([("a", True)], "cat string, y boolean")
    with pytest.raises(ValueError):
        woe_iv(df, "cat", F.col("y"), smooth=0.0)


def test_token_entropy_edges_and_reference(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),  # one type: entropy 0, norm NULL
            (2, "a b c d"),  # uniform: entropy = ln(4), norm 1
            (3, "A a b B"),  # lowercased: 2 types, uniform
            (4, "   "),  # whitespace-only: no row
            (5, "x y y"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in token_entropy(docs, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[1]["n_types"] == 1 and got[1]["entropy"] == 0.0
    assert got[1]["norm_entropy"] is None
    assert got[2]["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert got[2]["norm_entropy"] == pytest.approx(1.0, abs=1e-6)
    assert got[3]["n_types"] == 2 and got[3]["n_tokens"] == 4
    assert got[5]["entropy"] == pytest.approx(
        _ref_entropy([1, 2]), abs=1e-6
    )
    assert got[5]["ttr"] == pytest.approx(2 / 3, abs=1e-9)


def test_unigram_kl_axioms(spark):
    p = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog ran")], "id int, text string"
    )
    same = spark.createDataFrame(
        [(9, "the cat sat the dog ran")], "id int, text string"
    )
    row = unigram_kl(p, same).collect()[0]
    # identical token multisets → exactly zero both ways
    assert row["kl_pq"] == 0.0 and row["kl_qp"] == 0.0
    assert row["n_p"] == row["n_q"] == 6 and row["vocab"] == 5

    q = spark.createDataFrame(
        [(3, "apples bananas apples"), (4, "pears")], "id int, text string"
    )
    row2 = unigram_kl(p, q).collect()[0]
    assert row2["kl_pq"] > 0.0 and row2["kl_qp"] > 0.0
    assert row2["vocab"] == 8 and row2["n_p"] == 6 and row2["n_q"] == 4

    # python reference with the same add-1 smoothing
    def ref_kl(cp, cq, v):
        np_, nq_ = sum(cp.values()), sum(cq.values())
        s = 0.0
        for t in v:
            pi = (cp.get(t, 0) + 1) / (np_ + len(v))
            qi = (cq.get(t, 0) + 1) / (nq_ + len(v))
            s += pi * math.log(pi / qi)
        return s

    cp = {"the": 2, "cat": 1, "sat": 1, "dog": 1, "ran": 1}
    cq = {"apples": 2, "bananas": 1, "pears": 1}
    vocab = set(cp) | set(cq)
    assert row2["kl_pq"] == pytest.approx(ref_kl(cp, cq, vocab), abs=1e-7)
    assert row2["kl_qp"] == pytest.approx(ref_kl(cq, cp, vocab), abs=1e-7)
