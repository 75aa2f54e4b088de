"""Round-9 batch-1 operators: HITS, degree assortativity, k-anonymity,
RFM segmentation, seasonal decomposition — hand-computed fixtures plus
reference-library cross-checks."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# hits


def test_hits_tiny_graph(spark):
    from pangool_spark.operators.graph import hits

    # s1 -> {p1, p2}, s2 -> {p2}
    edges = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 102)], ["src", "dst"]
    )
    out = {r["node"]: (r["hub"], r["authority"]) for r in hits(edges, iterations=1).collect()}
    # round 1: auth = in-degree (hub0 = 1); hub = sum auth over out-edges
    assert out[101] == (0, 1)
    assert out[102] == (0, 2)
    assert out[1] == (3, 0)   # 1 + 2
    assert out[2] == (2, 0)
    out2 = {r["node"]: (r["hub"], r["authority"]) for r in hits(edges, iterations=2).collect()}
    # round 2: auth(p1) = hub(s1) = 3; auth(p2) = 3 + 2 = 5
    #          hub(s1) = 3 + 5 = 8; hub(s2) = 5
    assert out2[101] == (0, 3)
    assert out2[102] == (0, 5)
    assert out2[1] == (8, 0)
    assert out2[2] == (5, 0)


def test_hits_rejects_zero_iterations(spark):
    from pangool_spark.operators.graph import hits

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        hits(edges, iterations=0)


# ---------------------------------------------------------------------------
# degree_assortativity


def test_assortativity_matches_numpy(spark):
    import numpy as np

    from pangool_spark.operators.graph import degree_assortativity

    # star + a triangle appendage: clearly disassortative
    edges = [(0, i) for i in range(1, 6)] + [(1, 2), (6, 7), (7, 8), (6, 8)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    row = degree_assortativity(df).collect()[0]

    deg = {}
    und = set()
    for a, b in edges:
        x, y = min(a, b), max(a, b)
        und.add((x, y))
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in und:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    expect = np.corrcoef(xs, ys)[0, 1]
    assert row["n_edge_ends"] == 2 * len(und)
    assert math.isclose(row["assortativity"], expect, rel_tol=1e-12)
    assert row["assortativity"] < 0  # hub-and-spoke


def test_assortativity_regular_graph_null(spark):
    from pangool_spark.operators.graph import degree_assortativity

    # 4-cycle: every degree = 2 — zero variance, r undefined -> NULL
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], ["src", "dst"]
    )
    row = degree_assortativity(df).collect()[0]
    assert row["assortativity"] is None
    assert row["r_den_x"] == 0.0


# ---------------------------------------------------------------------------
# k_anonymity / suppress_small_classes


@pytest.fixture()
def people(spark):
    rows = []
    # class (US, A): 3 rows, uniform sensitive; (US, B): 2 rows, diverse;
    # (DE, A): 1 row
    rows += [("US", "A", "flu", i) for i in range(3)]
    rows += [("US", "B", "flu", 10), ("US", "B", "cold", 11)]
    rows += [("DE", "A", "flu", 20)]
    return spark.createDataFrame(rows, ["country", "grp", "diag", "pid"])


def test_k_anonymity_report(spark, people):
    from pangool_spark.operators.profile import k_anonymity

    out = {
        (r["country"], r["grp"]): r
        for r in k_anonymity(
            people, ["country", "grp"], k=2, sensitive_col="diag"
        ).collect()
    }
    assert out[("US", "A")]["class_size"] == 3
    assert out[("US", "A")]["anonymous"] is True
    assert out[("US", "A")]["l_distinct"] == 1  # k-anonymous but 1-diverse
    assert out[("US", "B")]["l_distinct"] == 2
    assert out[("DE", "A")]["anonymous"] is False


def test_suppress_small_classes(spark, people):
    from pangool_spark.operators.profile import suppress_small_classes

    kept = suppress_small_classes(people, ["country", "grp"], k=2)
    assert sorted(r["pid"] for r in kept.collect()) == [0, 1, 2, 10, 11]


def test_k_anonymity_validates(spark, people):
    from pangool_spark.operators.profile import k_anonymity

    with pytest.raises(ValueError):
        k_anonymity(people, [], k=2)
    with pytest.raises(ValueError):
        k_anonymity(people, ["country"], k=0)


# ---------------------------------------------------------------------------
# rfm_segmentation


def test_rfm_scores(spark):
    import datetime

    from pangool_spark.operators.journeys import rfm_segmentation

    d = datetime.date
    rows = []
    # 8 customers with spend 100, 200, ..., 800 (one order each, same day)
    for i in range(8):
        rows.append((i, d(2024, 1, 1 + i), (i + 1) * 100))
    df = spark.createDataFrame(rows, ["cust", "day", "cents"])
    out = {r["key"]: r for r in rfm_segmentation(df, "cust", "day", "cents").collect()}
    # monetary quartiles of 100..800: q25=275, q50=450, q75=625
    assert [out[i]["m_score"] for i in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]
    # recency: anchor = 2024-01-08; recency 7..0 -> reversed scores
    assert [out[i]["r_score"] for i in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]
    # frequency all equal -> all score 1 (ties land low)
    assert {out[i]["f_score"] for i in range(8)} == {1}
    assert out[7]["rfm"] == "414"


def test_rfm_rejects_fractional_amount(spark):
    import datetime

    from pangool_spark.operators.journeys import rfm_segmentation

    df = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1), 1.5)], ["cust", "day", "amt"]
    )
    with pytest.raises(ValueError):
        rfm_segmentation(df, "cust", "day", "amt")


# ---------------------------------------------------------------------------
# seasonal_decompose


def test_seasonal_decompose_pure_signal(spark):
    from pangool_spark.operators.windows import seasonal_decompose

    # y = 100 (level) + phase*10 (pure period-3 seasonal), 12 ticks.
    # Centered MA of one full period removes the seasonal exactly, so
    # trend == 110 (level + mean seasonal), seasonal == phase*10 - 10,
    # residual == 0 on every full window.
    rows = [(1, t, 100 + (t % 3) * 10) for t in range(12)]
    df = spark.createDataFrame(rows, ["k", "t", "y"])
    out = {
        r["t"]: r
        for r in seasonal_decompose(df, ["k"], "t", "y", period=3).collect()
    }
    assert out[0]["trend"] is None and out[11]["trend"] is None  # edges
    for t in range(1, 11):
        assert out[t]["trend"] == pytest.approx(110.0, abs=0)
        assert out[t]["residual"] == pytest.approx(0.0, abs=0)
    assert out[3]["seasonal"] == pytest.approx(-10.0, abs=0)  # phase 0
    assert out[4]["seasonal"] == pytest.approx(0.0, abs=0)
    assert out[5]["seasonal"] == pytest.approx(10.0, abs=0)


def test_seasonal_decompose_validates(spark):
    from pangool_spark.operators.windows import seasonal_decompose

    df = spark.createDataFrame([(1, 1, 1)], ["k", "t", "y"])
    with pytest.raises(ValueError):
        seasonal_decompose(df, ["k"], "t", "y", period=4)  # even
    dff = spark.createDataFrame([(1, 1, 1.5)], ["k", "t", "y"])
    with pytest.raises(ValueError):
        seasonal_decompose(dff, ["k"], "t", "y", period=3)


def test_seasonal_decompose_phase_col(spark):
    from pangool_spark.operators.windows import seasonal_decompose

    rows = [(1, t, t % 5, 100) for t in range(10)]
    df = spark.createDataFrame(rows, ["k", "t", "ph", "y"])
    out = seasonal_decompose(
        df, ["k"], "t", "y", period=5, phase_col="ph"
    ).collect()
    # constant series: every full-window trend is 100, seasonal 0
    full = [r for r in out if r["trend"] is not None]
    assert len(full) == 6
    assert all(r["trend"] == 100.0 and r["seasonal"] == 0.0 for r in full)
