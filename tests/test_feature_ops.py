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


def test_kaplan_meier_reference_parity(spark):
    from pangool_spark.operators.stats import kaplan_meier

    # (duration, event): classic textbook-style small cohort
    rows = [
        (1, 1), (1, 1), (2, 0), (3, 1), (3, 0), (5, 1), (5, 1), (7, 0),
        (None, 1), (4, None),
    ]
    df = spark.createDataFrame(rows, "t int, ev int")
    got = {
        r["t"]: (r["n_risk"], r["n_events"], r["survival"])
        for r in kaplan_meier(df, "t", "ev").collect()
    }

    def py_km(rows):
        rows = [(t, e) for t, e in rows if t is not None and e is not None]
        times = sorted({t for t, _e in rows})
        total = len(rows)
        s, out, removed = 1.0, {}, 0
        for t in times:
            n_risk = total - removed
            d = sum(1 for tt, e in rows if tt == t and e)
            c = sum(1 for tt, _e in rows if tt == t)
            s = s * (1.0 - float(d) / float(n_risk))
            if d > 0:
                out[t] = (n_risk, d, s)
            removed += c
        return out

    assert got == py_km(rows)
    # survival is monotone nonincreasing and in (0, 1]
    surv = [got[t][2] for t in sorted(got)]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0.0 <= x <= 1.0 for x in surv)


def test_kaplan_meier_type_guard(spark):
    import pytest

    from pangool_spark.operators.stats import kaplan_meier

    df = spark.createDataFrame([(1.5, 1)], "t double, ev int")
    with pytest.raises(ValueError, match="integer-typed"):
        kaplan_meier(df, "t", "ev")


def test_mann_whitney_matches_scipy_free_reference(spark):
    import random

    from pangool_spark.operators.stats import mann_whitney_u

    rng = random.Random(41)
    rows = []
    for g in ("x", "y"):
        for _ in range(120):
            rows.append((g, rng.randint(0, 1), rng.randint(0, 9)))
    rows += [("x", None, 3), ("x", 0, None), ("x", 2, 5)]  # dropped
    df = spark.createDataFrame(rows, "g string, arm int, v int")
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["u_a"], r["u_b"], r["z"])
        for r in mann_whitney_u(df, ["g"], "arm", "v").collect()
    }

    import math

    def ref(vals_a, vals_b):
        na, nb = len(vals_a), len(vals_b)
        u2 = 0  # 2*U_A
        for a in vals_a:
            for b in vals_b:
                if a > b:
                    u2 += 2
                elif a == b:
                    u2 += 1
        from collections import Counter

        ties = sum(
            t**3 - t for t in Counter(vals_a + vals_b).values()
        )
        n = na + nb
        ua = u2 / 2.0
        mu = float(na) * float(nb) / 2.0
        var = float(na) * float(nb) / 12.0 * (
            (float(n) + 1.0) - float(ties) / (float(n) * (float(n) - 1.0))
        )
        z = (ua - mu) / math.sqrt(var) if var > 0 else None
        return na, nb, ua, float(na) * float(nb) - ua, z

    for g in ("x", "y"):
        va = [v for gg, a, v in rows if gg == g and a == 0 and v is not None]
        vb = [v for gg, a, v in rows if gg == g and a == 1 and v is not None]
        assert got[g] == ref(va, vb)


def test_mann_whitney_guards_and_degenerate(spark):
    import pytest

    from pangool_spark.operators.stats import mann_whitney_u

    dbl = spark.createDataFrame([("g", 0, 1.5)], "g string, arm int, v double")
    with pytest.raises(ValueError, match="integer-typed"):
        mann_whitney_u(dbl, ["g"], "arm", "v")
    # all values identical -> zero variance -> NULL z, exact U = n_a*n_b/2
    same = spark.createDataFrame(
        [("g", i % 2, 7) for i in range(10)], "g string, arm int, v int"
    )
    r = mann_whitney_u(same, ["g"], "arm", "v").collect()[0]
    assert r["z"] is None and r["u_a"] == r["u_b"] == 12.5


def test_backtest_seasonal_naive_reference(spark):
    import pytest

    from pangool_spark.operators.stats import backtest_seasonal_naive

    # key "a": days 1..10 with values 10*d; season 3 -> err = 30 each
    rows = [("a", f"2024-01-{d:02d} 12:00:00", 10 * d) for d in range(1, 11)]
    # key "b": only two days, 3 apart, two events on day 4 (sum = 9)
    rows += [
        ("b", "2024-01-01 00:00:00", 5),
        ("b", "2024-01-04 06:00:00", 4),
        ("b", "2024-01-04 18:00:00", 5),
    ]
    # key "c": no comparable pair -> absent; NULLs dropped
    rows += [("c", "2024-01-01 00:00:00", 1), ("c", None, 7), ("c", "2024-01-02 00:00:00", None)]
    df = spark.createDataFrame(rows, "k string, ts string, v long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        r["k"]: (r["n_days"], r["mae"], r["bias"])
        for r in backtest_seasonal_naive(df, ["k"], "ts", "v", season_days=3).collect()
    }
    assert got["a"] == (7, 30.0, 30.0)
    assert got["b"] == (1, 4.0, 4.0)  # 9 - 5
    assert "c" not in got
    with pytest.raises(ValueError, match="integer-typed"):
        backtest_seasonal_naive(
            df.withColumn("v", F.col("v").cast("double")), ["k"], "ts", "v"
        )
    with pytest.raises(ValueError, match="season_days"):
        backtest_seasonal_naive(df, ["k"], "ts", "v", season_days=0)


def test_hardening_guards(spark):
    import pytest

    from pangool_spark.operators.sampling import temporal_split
    from pangool_spark.streaming.ops import stream_upsert

    df = spark.createDataFrame([(1, "2024-01-01 00:00:00")], "id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    with pytest.raises(ValueError, match="embargo"):
        temporal_split(df, "ts", "2024-01-20 00:00:00", "3 days; DROP TABLE x")
    # spaces tolerated
    out = temporal_split(df, "ts", "2024-01-20 00:00:00", "  3 days ")
    assert out.collect()[0]["split"] == "train"
    with pytest.raises(ValueError, match="keep_versions"):
        stream_upsert(df, ["id"], ["ts"], "/tmp/x", keep_versions=0)


def test_hashed_features_odd_dim_matches_integer_div(spark):
    import hashlib

    from pangool_spark.operators.text import hashed_features

    # dim=7 (non-power-of-2): sign must follow exact integer division
    texts = {1: "alpha beta gamma delta epsilon zeta eta theta"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r["doc_id"], r["idx"]): r["value"]
        for r in hashed_features(df, dim=7).collect()
    }
    want = {}
    for tok in texts[1].lower().split():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) & 0x7FFFFFFF
        sign = 1 if (h // 7) % 2 == 0 else -1
        key = (1, h % 7)
        want[key] = want.get(key, 0) + sign
    assert got == want


def test_kmv_intersect_exact_regime_and_accuracy(spark):
    import pytest

    from pangool_spark.operators.grouping import kmv_intersect, kmv_state

    # exact regime: tiny sets, union < k -> exact intersection count
    a_rows = [("g", v) for v in range(10)]
    b_rows = [("g", v) for v in range(5, 15)]  # overlap = 5..9
    a = kmv_state(
        spark.createDataFrame(a_rows, "g string, v long"), ["g"], "v", k=64
    )
    b = kmv_state(
        spark.createDataFrame(b_rows, "g string, v long"), ["g"], "v", k=64
    )
    r = kmv_intersect(a, b, ["g"], k=64).collect()[0]
    assert r["est_intersection"] == 5 and r["n_common"] == 5

    # estimate regime: 3000 vs 3000 with 1000 shared distinct values
    a_rows = [("g", v) for v in range(3000)]
    b_rows = [("g", v) for v in range(2000, 5000)]
    a = kmv_state(
        spark.createDataFrame(a_rows, "g string, v long"), ["g"], "v", k=64
    )
    b = kmv_state(
        spark.createDataFrame(b_rows, "g string, v long"), ["g"], "v", k=64
    )
    r = kmv_intersect(a, b, ["g"], k=64).collect()[0]
    true = 1000.0
    assert true * 0.3 <= r["est_intersection"] <= true * 3.0  # k=64 accuracy
    with pytest.raises(ValueError, match="k must be"):
        kmv_intersect(a, b, ["g"], k=1)
