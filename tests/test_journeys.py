"""funnel / funnel_report / cohort_retention vs hand-computed journeys —
including the out-of-order trap (a purchase BEFORE the first view must
not count) and repeat-activity cohort cells."""

import datetime as dt

import pytest

from pangool_spark.operators.journeys import cohort_retention, funnel_report, funnel_times


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _events(spark):
    rows = [
        # u1 completes view -> click -> purchase in order
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        # u2 purchases BEFORE viewing: must stop after click
        (2, "purchase", _ts(1)), (2, "view", _ts(2)), (2, "click", _ts(3)),
        # u3 views only
        (3, "view", _ts(5)),
        # u4 never views (click+purchase): not in the funnel at all
        (4, "click", _ts(1)), (4, "purchase", _ts(2)),
        # u5 view->click same funnel but click at the SAME ts as view:
        # strict ordering requires ts >, so the click does not count
        (5, "view", _ts(7)), (5, "click", _ts(7)),
    ]
    return spark.createDataFrame(rows, "user_id LONG, event_type STRING, ts TIMESTAMP")


def test_funnel_per_user(spark):
    out = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase)
        for r in funnel_times(_events(spark), ["view", "click", "purchase"]).collect()
    }
    assert set(out) == {1, 2, 3, 5}  # u4 never entered
    assert out[1] == (_ts(1), _ts(2), _ts(3))
    assert out[2] == (_ts(2), _ts(3), None)  # purchase was before the view
    assert out[3] == (_ts(5), None, None)
    assert out[5] == (_ts(7), None, None)  # same-ts click: strict >


def test_funnel_report_and_validation(spark):
    rep = {
        (r.step_idx, r.step): r.n_users
        for r in funnel_report(_events(spark), ["view", "click", "purchase"]).collect()
    }
    assert rep == {(1, "view"): 4, (2, "click"): 2, (3, "purchase"): 1}
    with pytest.raises(ValueError, match="at least 2"):
        funnel_times(_events(spark), ["view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_times(_events(spark), ["view", "view"])


def test_cohort_retention(spark):
    rows = [
        # u1 first active week 0, active weeks 0,1,2; u2 week 0 only;
        # u3 first active week 1, active weeks 1,2
        (1, "view", dt.datetime(2024, 1, 4)),    # thu week A
        (1, "click", dt.datetime(2024, 1, 11)),
        (1, "view", dt.datetime(2024, 1, 18)),
        (2, "view", dt.datetime(2024, 1, 5)),
        (2, "view", dt.datetime(2024, 1, 5, 12)),  # same period, distinct-safe
        (3, "view", dt.datetime(2024, 1, 11)),
        (3, "view", dt.datetime(2024, 1, 18)),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, event_type STRING, ts TIMESTAMP")
    got = {
        (r.cohort_period, r.period_offset): (r.n_users, r.cohort_size, r.retention)
        for r in cohort_retention(df).collect()
    }
    # weeks are epoch-day//7 buckets; Jan 4 2024 and Jan 5 are the same bucket
    cohorts = sorted({c for c, _ in got})
    a, b = cohorts[0], cohorts[1]
    assert b == a + 1
    assert got[(a, 0)] == (2, 2, 1.0)
    assert got[(a, 1)] == (1, 2, 0.5)
    assert got[(a, 2)] == (1, 2, 0.5)
    assert got[(b, 0)] == (1, 1, 1.0)
    assert got[(b, 1)] == (1, 1, 1.0)
    with pytest.raises(ValueError, match="period_days"):
        cohort_retention(df, period_days=0)


def test_market_basket(spark):
    from pangool_spark.operators.journeys import market_basket

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "c"), (4, "c"),  # duplicate item in one basket collapses
        (5, "d"),
    ]
    df = spark.createDataFrame(rows, "k LONG, p STRING")
    got = {(r.pa, r.pb): r for r in market_basket(df, "k", "p", 2).collect()}
    assert set(got) == {("a", "b")}  # only pair in >=2 baskets
    r = got[("a", "b")]
    assert r.n_ab == 3 and r.support == 3.0 / 5.0
    assert r.lift == (3.0 * 5.0) / (3.0 * 3.0)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="min_support"):
        market_basket(df, "k", "p", 0)


def test_kcore_peeling(spark):
    from pangool_spark.operators.graph import kcore

    # a 4-clique with a pendant chain: the 3-core is exactly the clique;
    # duplicate/reverse/self edges must be cleaned first
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),   # clique
        (4, 5), (5, 6),                                    # chain
        (2, 1), (3, 3),                                    # reverse + loop
    ]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {(r.a, r.b) for r in kcore(df, k=3, max_iter=3).collect()}
    assert got == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    # a cycle has no 3-core: with enough rounds it empties;
    # with max_iter=1 only one peel has happened (fixed-iteration contract)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)] + [(6, 0)], "src LONG, dst LONG"
    )
    assert kcore(chain, k=3, max_iter=2).count() == 0
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "src LONG, dst LONG")
    assert kcore(star, k=2, max_iter=1).count() == 0  # leaves die, hub starves
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        kcore(df, k=0)


def test_edge_support_and_ktruss(spark):
    from pangool_spark.operators.graph import edge_support, ktruss

    # 5-clique + a pendant triangle sharing one vertex
    clique = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    extra = [(5, 6), (5, 7), (6, 7)]
    df = spark.createDataFrame(clique + extra, "src LONG, dst LONG")
    sup = {(r.a, r.b): r.support for r in edge_support(df).collect()}
    for e in clique:
        assert sup[e] == 3  # every clique edge: 3 common neighbors
    assert sup[(6, 7)] == 1 and sup[(5, 6)] == 1
    # 5-truss (support >= 3): exactly the clique survives
    got = {(r.a, r.b) for r in ktruss(df, k=5, max_iter=2).collect()}
    assert got == set(clique)
    # cascade: removing the weak edges cannot resurrect support
    assert ktruss(df, k=6, max_iter=2).count() == 0
    # an edge in no triangle reports 0 and dies at any k
    lone = spark.createDataFrame([(1, 2)], "src LONG, dst LONG")
    assert edge_support(lone).first().support == 0
    assert ktruss(lone, k=3, max_iter=1).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        ktruss(df, k=2)
