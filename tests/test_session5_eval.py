"""Round-10 session-5 operators: classification_report, spearman_corr,
logrank_test — each pinned against a pure-Python reference on small
fixtures, plus edge-case contracts (zero-division conventions, NULL
handling, degenerate inputs)."""

import math

import pytest


# ---------------------------------------------------------------------------
# pure-python references


def _ref_report(pairs):
    """sklearn-convention classification report (zero_division=0)."""
    classes = sorted({a for a, _ in pairs} | {p for _, p in pairs})
    n = len(pairs)
    out = {}
    tp_ = {c: sum(1 for a, p in pairs if a == c and p == c) for c in classes}
    t_ = {c: sum(1 for a, _ in pairs if a == c) for c in classes}
    p_ = {c: sum(1 for _, p in pairs if p == c) for c in classes}
    c_total = sum(tp_.values())
    f1s = {}
    for c in classes:
        tp, t, pk = tp_[c], t_[c], p_[c]
        prec = tp / pk if pk else 0.0
        rec = tp / t if t else 0.0
        f1 = 2 * tp / (2 * tp + (pk - tp) + (t - tp)) if (2 * tp + (pk - tp) + (t - tp)) else 0.0
        f1s[c] = f1
        out[c] = (tp, pk - tp, t - tp, t, prec, rec, f1)
    macro = sum(round(f, 9) for f in f1s.values()) / len(classes)
    s = n
    spt = sum(p_[c] * t_[c] for c in classes)
    spp = sum(p_[c] ** 2 for c in classes)
    stt = sum(t_[c] ** 2 for c in classes)
    num = c_total * s - spt
    d1, d2 = s * s - spp, s * s - stt
    mcc = num / (math.sqrt(d1) * math.sqrt(d2)) if d1 > 0 and d2 > 0 else None
    return out, c_total / n, macro, mcc


def _ref_spearman(xs, ys):
    def midranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        r = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and v[order[j]] == v[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0
            for k in range(i, j):
                r[order[k]] = avg
            i = j
        return r

    rx, ry = midranks(xs), midranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    num = n * sxy - sx * sy
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return num / (math.sqrt(vx) * math.sqrt(vy))


def _ref_logrank(subjects):
    """subjects: list of (arm, t, event)."""
    times = sorted({t for _, t, e in subjects if e})
    soe = se1 = sv = 0.0
    for t in times:
        n1 = sum(1 for a, tt, _ in subjects if a == 1 and tt >= t)
        n0 = sum(1 for a, tt, _ in subjects if a == 0 and tt >= t)
        d1 = sum(1 for a, tt, e in subjects if a == 1 and tt == t and e)
        d0 = sum(1 for a, tt, e in subjects if a == 0 and tt == t and e)
        n, d = n1 + n0, d1 + d0
        if d == 0:
            continue
        e1 = d * n1 / n
        v = d * n1 * n0 * (n - d) / (n * n * (n - 1)) if n > 1 else 0.0
        soe += round((d1 - e1) * 1e9) / 1e9
        se1 += round(e1 * 1e9) / 1e9
        sv += round(v * 1e9) / 1e9
    chi2 = (soe * soe / sv) if sv > 0 else None
    return se1, chi2


# ---------------------------------------------------------------------------
# classification_report


def test_classification_report_matches_reference(spark):
    from pangool_spark.operators.ml import classification_report

    pairs = [
        ("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "c"),
        ("c", "c"), ("c", "a"), ("c", "c"), ("b", "b"), ("a", "a"),
    ]
    df = spark.createDataFrame(pairs, "label string, pred string")
    got = {
        r["class"]: r
        for r in classification_report(df, "label", "pred").collect()
    }
    ref, acc, macro, mcc = _ref_report(pairs)
    assert set(got) == set(ref)
    for c, (tp, fp, fn, sup, prec, rec, f1) in ref.items():
        r = got[c]
        assert (r.tp, r.fp, r.fn, r.support) == (tp, fp, fn, sup), c
        assert r.precision == pytest.approx(prec, abs=1e-12)
        assert r.recall == pytest.approx(rec, abs=1e-12)
        assert r.f1 == pytest.approx(f1, abs=1e-12)
        assert r.accuracy == pytest.approx(acc, abs=1e-12)
        assert r.macro_f1 == pytest.approx(macro, abs=1e-9)
        assert r.mcc == pytest.approx(mcc, abs=1e-12)


def test_classification_report_zero_division_and_class_union(spark):
    from pangool_spark.operators.ml import classification_report

    # 'c' is never predicted (recall>0 impossible → precision 0 by
    # convention); 'd' is predicted but never true (recall 0)
    pairs = [("a", "a"), ("c", "a"), ("a", "d")]
    df = spark.createDataFrame(pairs, "label string, pred string")
    got = {
        r["class"]: r
        for r in classification_report(df, "label", "pred").collect()
    }
    assert set(got) == {"a", "c", "d"}
    assert got["c"].precision == 0.0 and got["c"].recall == 0.0
    assert got["c"].f1 == 0.0
    assert got["d"].support == 0 and got["d"].fp == 1
    assert got["d"].precision == 0.0


def test_classification_report_null_rows_dropped_and_degenerate_mcc(spark):
    from pangool_spark.operators.ml import classification_report

    df = spark.createDataFrame(
        [("a", "a"), ("a", None), (None, "a"), ("a", "a")],
        "label string, pred string",
    )
    rows = classification_report(df, "label", "pred").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.tp, r.support) == (2, 2)
    assert r.accuracy == 1.0
    assert r.mcc is None  # single class: s² − Σp² = 0


# ---------------------------------------------------------------------------
# spearman_corr


def test_spearman_perfect_monotone_and_reverse(spark):
    from pangool_spark.operators.stats import spearman_corr

    rows = [("g", x, x * x * x) for x in range(1, 12)]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    got = spearman_corr(df, ["g"], "x", "y").collect()[0]
    # the sums are exact ints but sqrt(v)·sqrt(v) is 1 ulp off v, so
    # monotone data lands within an ulp of ±1, not exactly on it
    assert got.rho == pytest.approx(1.0, abs=1e-15)
    rows = [("g", x, -x * x * x) for x in range(1, 12)]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    got = spearman_corr(df, ["g"], "x", "y").collect()[0]
    assert got.rho == pytest.approx(-1.0, abs=1e-15)


def test_spearman_ties_match_reference(spark):
    from pangool_spark.operators.stats import spearman_corr

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    ys = [2, 7, 1, 8, 2, 8, 1, 8, 2, 8, 4]
    rows = [("g", x, y) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    got = spearman_corr(df, ["g"], "x", "y").collect()[0]
    assert got.n == len(xs)
    assert got.rho == pytest.approx(_ref_spearman(xs, ys), abs=1e-12)


def test_spearman_constant_group_null_and_nulls_dropped(spark):
    from pangool_spark.operators.stats import spearman_corr

    rows = [("g", 7, y) for y in range(5)] + [("h", 1, 2), ("h", None, 3)]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    got = {r.g: r for r in spearman_corr(df, ["g"], "x", "y").collect()}
    assert got["g"].rho is None  # constant x → no rank variance
    assert got["h"].n == 1  # NULL x row dropped
    assert got["h"].rho is None


def test_spearman_requires_integer_columns(spark):
    from pangool_spark.operators.stats import spearman_corr

    df = spark.createDataFrame([("g", 1.0, 2)], "g string, x double, y bigint")
    with pytest.raises(ValueError, match="integer-typed"):
        spearman_corr(df, ["g"], "x", "y")


# ---------------------------------------------------------------------------
# logrank_test


def test_logrank_matches_reference(spark):
    from pangool_spark.operators.stats import logrank_test

    subjects = [
        (1, 2, 1), (1, 3, 0), (1, 5, 1), (1, 5, 1), (1, 8, 0), (1, 9, 1),
        (0, 1, 1), (0, 2, 1), (0, 2, 0), (0, 4, 1), (0, 5, 1), (0, 7, 0),
        (0, 9, 1),
    ]
    df = spark.createDataFrame(subjects, "arm int, t int, ev int")
    got = logrank_test(df, "arm", "t", "ev").collect()[0]
    exp_e1, exp_chi2 = _ref_logrank(subjects)
    assert got.n_1 == 6 and got.n_0 == 7
    assert got.observed_1 == 4
    assert got.expected_1 == pytest.approx(exp_e1, abs=1e-9)
    assert got.chi2 == pytest.approx(exp_chi2, rel=1e-9)


def test_logrank_identical_arms_zero_statistic(spark):
    from pangool_spark.operators.stats import logrank_test

    # perfectly mirrored arms: every per-time O−E term is exactly 0
    base = [(1, 1), (2, 1), (3, 0), (4, 1), (5, 0)]
    subjects = [(a, t, e) for a in (0, 1) for t, e in base]
    df = spark.createDataFrame(subjects, "arm int, t int, ev int")
    got = logrank_test(df, "arm", "t", "ev").collect()[0]
    assert got.chi2 == pytest.approx(0.0, abs=1e-9)


def test_logrank_null_rows_and_bad_arm_dropped(spark):
    from pangool_spark.operators.stats import logrank_test

    subjects = [(1, 2, 1), (0, 2, 1), (None, 3, 1), (2, 3, 1), (1, None, 1)]
    df = spark.createDataFrame(subjects, "arm int, t int, ev int")
    got = logrank_test(df, "arm", "t", "ev").collect()[0]
    assert got.n_1 == 1 and got.n_0 == 1


def test_logrank_requires_integer_durations(spark):
    from pangool_spark.operators.stats import logrank_test

    df = spark.createDataFrame([(1, 1.5, 1)], "arm int, t double, ev int")
    with pytest.raises(ValueError, match="integer-typed"):
        logrank_test(df, "arm", "t", "ev")


def test_spearman_null_group_key_preserved(spark):
    """GROUP BY keeps NULL as a key; the rank-table reassembly joins must
    too (round-11 advisor: plain `=` joins silently dropped NULL-keyed
    groups). The NULL group must come out with the same rho as an
    identically-shaped named group."""
    from pangool_spark.operators.stats import spearman_corr

    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    ys = [2, 7, 1, 8, 2, 8, 1, 8]
    rows = [("g", x, y) for x, y in zip(xs, ys)] + [
        (None, x, y) for x, y in zip(xs, ys)
    ]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    got = {r.g: r for r in spearman_corr(df, ["g"], "x", "y").collect()}
    assert set(got) == {"g", None}
    assert got[None].n == len(xs)
    assert got[None].rho == pytest.approx(got["g"].rho, abs=1e-15)
