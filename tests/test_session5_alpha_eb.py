"""Round-10 session-5 batch 5: krippendorff_alpha and eb_rate_shrinkage
— pure-python reference pins plus edge contracts."""

import pytest


def _ref_alpha(ratings):
    """ratings: list of (unit, value)."""
    from collections import Counter, defaultdict

    per_unit = defaultdict(Counter)
    for u, v in ratings:
        per_unit[u][v] += 1
    pair = {u: c for u, c in per_unit.items() if sum(c.values()) >= 2}
    qdo = 0
    nv = Counter()
    for c in pair.values():
        mu = sum(c.values())
        for v, n in c.items():
            qdo += round(n * (mu - n) / (mu - 1) * 1e9)
            nv[v] += n
    n_total = sum(nv.values())
    d_o = qdo / 1e9
    d_e = (n_total * n_total - sum(x * x for x in nv.values())) / (
        n_total - 1.0
    )
    alpha = 1.0 - d_o / d_e if d_e > 0 else None
    return len(pair), n_total, d_o, d_e, alpha


def test_krippendorff_matches_reference(spark):
    from pangool_spark.operators.stats import krippendorff_alpha

    ratings = [
        ("u1", "a"), ("u1", "a"), ("u1", "b"),
        ("u2", "b"), ("u2", "b"),
        ("u3", "a"), ("u3", "c"), ("u3", "c"), ("u3", "c"),
        ("u4", "a"),  # single rating: unpairable, dropped
    ]
    df = spark.createDataFrame(ratings, "u string, v string")
    got = krippendorff_alpha(df, "u", "v").collect()[0]
    n_units, n_ratings, d_o, d_e, alpha = _ref_alpha(ratings)
    assert got.n_units == n_units == 3
    assert got.n_ratings == n_ratings == 9
    assert got.d_o == pytest.approx(d_o, abs=1e-9)
    assert got.d_e == pytest.approx(d_e, rel=1e-12)
    assert got.alpha == pytest.approx(alpha, rel=1e-9)


def test_krippendorff_perfect_agreement_is_one(spark):
    from pangool_spark.operators.stats import krippendorff_alpha

    ratings = [("u1", "a")] * 3 + [("u2", "b")] * 4 + [("u3", "a")] * 2
    df = spark.createDataFrame(ratings, "u string, v string")
    got = krippendorff_alpha(df, "u", "v").collect()[0]
    assert got.d_o == 0.0
    assert got.alpha == 1.0


def test_krippendorff_degenerate_single_value(spark):
    from pangool_spark.operators.stats import krippendorff_alpha

    # every pairable rating identical → D_e = 0 → alpha undefined
    df = spark.createDataFrame(
        [("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "a")],
        "u string, v string",
    )
    got = krippendorff_alpha(df, "u", "v").collect()[0]
    assert got.d_e == 0.0 and got.alpha is None


def _ref_eb(keys, min_trials=1):
    kept = [(k, n) for k, n in keys if n >= min_trials]
    qr = [round(k / n * 1e4) for k, n in kept]
    nk = len(qr)
    sr, srr = sum(qr), sum(q * q for q in qr)
    m = sr / 1e4 / nk
    v = (srr / 1e8 - (sr / 1e4) * (sr / 1e4) / nk) / (nk - 1.0)
    c = m * (1.0 - m) / v - 1.0
    alpha, beta = m * c, (1.0 - m) * c
    return alpha, beta, [
        (k, n, (k + alpha) / (n + alpha + beta)) for k, n in kept
    ]


def test_eb_shrinkage_matches_reference(spark):
    from pangool_spark.operators.stats import eb_rate_shrinkage

    keys = [(1, 10), (9, 10), (5, 100), (40, 100), (0, 4), (3, 4), (2, 7)]
    rows = [(f"k{i}", k, n) for i, (k, n) in enumerate(keys)]
    df = spark.createDataFrame(rows, "key string, k bigint, n bigint")
    got = {
        r.key: r
        for r in eb_rate_shrinkage(df, ["key"], "k", "n").collect()
    }
    alpha, beta, shrunk = _ref_eb(keys)
    for i, (k, n, s) in enumerate(shrunk):
        r = got[f"k{i}"]
        assert (r.successes, r.trials) == (k, n)
        assert r.alpha == pytest.approx(alpha, rel=1e-9)
        assert r.beta == pytest.approx(beta, rel=1e-9)
        assert r.shrunk == pytest.approx(s, rel=1e-9)


def test_eb_shrinkage_pulls_small_samples_harder(spark):
    from pangool_spark.operators.stats import eb_rate_shrinkage

    # same observed rate, very different evidence: the small-n key must
    # move further toward the prior mean than the large-n key
    keys = [(1, 10), (100, 1000)] + [(h, 20) for h in (2, 4, 6, 8, 10)]
    rows = [(f"k{i}", k, n) for i, (k, n) in enumerate(keys)]
    df = spark.createDataFrame(rows, "key string, k bigint, n bigint")
    got = {r.key: r for r in eb_rate_shrinkage(df, ["key"], "k", "n").collect()}
    small, big = got["k0"], got["k1"]
    assert small.rate == big.rate == 0.1
    assert abs(small.shrunk - 0.1) > abs(big.shrunk - 0.1)


def test_eb_shrinkage_min_trials_and_degenerate(spark):
    from pangool_spark.operators.stats import eb_rate_shrinkage

    rows = [("a", 1, 2), ("b", 3, 10), ("c", 4, 10), ("d", 5, 10)]
    df = spark.createDataFrame(rows, "key string, k bigint, n bigint")
    out = eb_rate_shrinkage(df, ["key"], "k", "n", min_trials=5)
    assert {r.key for r in out.collect()} == {"b", "c", "d"}
    # identical rates → v = 0 → nothing to shrink, stated via NULLs
    same = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "key string, k bigint, n bigint"
    )
    for r in eb_rate_shrinkage(same, ["key"], "k", "n").collect():
        assert r.alpha is None and r.shrunk is None
        assert r.rate == pytest.approx(0.1)
    with pytest.raises(ValueError, match="min_trials"):
        eb_rate_shrinkage(df, ["key"], "k", "n", min_trials=0)
