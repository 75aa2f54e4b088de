"""Count-min sketch: over-count-only estimates, exact p=portable/fast
determinism, merge algebra, heavy-hitter exactness."""

import pytest
from pyspark.sql import functions as F


def _tokens_df(spark):
    rows = (
        [("the",)] * 50
        + [("hash",)] * 20
        + [("join",)] * 12
        + [(w,) for w in ("a b c d e f g h i j".split())] * 2
    )
    return spark.createDataFrame(rows, "w STRING")


def test_cms_estimates_never_undercount(spark):
    from pangool_spark.operators.sketch import cms_estimate, count_min_sketch

    df = _tokens_df(spark)
    exact = {r.w: r.n for r in df.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()}
    for fam in ("portable", "fast"):
        sk = count_min_sketch(df, "w", width=64, depth=4, hash_family=fam)
        # grid is bounded by depth x width
        assert sk.count() <= 4 * 64
        keys = spark.createDataFrame([(w,) for w in exact], "w STRING")
        est = {
            r.w: r.est_count
            for r in cms_estimate(sk, keys, "w", width=64, depth=4, hash_family=fam).collect()
        }
        assert set(est) == set(exact)
        for w, n in exact.items():
            assert est[w] >= n, (fam, w)
        # deterministic: rebuild gives identical estimates
        sk2 = count_min_sketch(df, "w", width=64, depth=4, hash_family=fam)
        est2 = {
            r.w: r.est_count
            for r in cms_estimate(sk2, keys, "w", width=64, depth=4, hash_family=fam).collect()
        }
        assert est == est2
    # wide grid, no collisions: estimates are exact
    sk = count_min_sketch(df, "w", width=4096, depth=4)
    keys = spark.createDataFrame([(w,) for w in exact], "w STRING")
    est = {r.w: r.est_count for r in cms_estimate(sk, keys, "w", width=4096, depth=4).collect()}
    assert est == exact


def test_cms_merge_equals_single_build(spark):
    from pangool_spark.operators.sketch import count_min_sketch, merge_sketches

    df = _tokens_df(spark).withColumn("half", F.monotonically_increasing_id() % 2)
    a = count_min_sketch(df.filter("half = 0"), "w", width=64, depth=3)
    b = count_min_sketch(df.filter("half = 1"), "w", width=64, depth=3)
    merged = {(r.j, r.bucket): r.n for r in merge_sketches(a, b).collect()}
    whole = {
        (r.j, r.bucket): r.n
        for r in count_min_sketch(df, "w", width=64, depth=3).collect()
    }
    assert merged == whole


def test_cms_heavy_hitters_exact_counts(spark):
    from pangool_spark.operators.sketch import cms_heavy_hitters

    df = _tokens_df(spark)
    got = {r.w: r.n for r in cms_heavy_hitters(df, "w", threshold=10, width=256, depth=4).collect()}
    assert got == {"the": 50, "hash": 20, "join": 12}
    # tiny grid: collisions may admit false positives into the exact
    # pass, but the exact count still filters them out
    got = {r.w: r.n for r in cms_heavy_hitters(df, "w", threshold=10, width=4, depth=1).collect()}
    assert got == {"the": 50, "hash": 20, "join": 12}
    with pytest.raises(ValueError, match="threshold"):
        cms_heavy_hitters(df, "w", threshold=0)
    with pytest.raises(ValueError, match="width"):
        cms_heavy_hitters(df, "w", threshold=1, width=0)
    with pytest.raises(ValueError, match="hash_family"):
        cms_heavy_hitters(df, "w", threshold=1, hash_family="sha1")


def test_kmv_state_merge_equals_recompute(spark):
    from pangool_spark.operators.grouping import (
        kmv_estimate,
        kmv_state,
        merge_kmv_states,
    )

    rows = [(i % 3, f"v{i % 500}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g INT, v STRING")
    a = df.filter("g != 0 OR v < 'v3'")       # arbitrary split
    b = df.exceptAll(a)
    merged = merge_kmv_states(
        kmv_state(a, ["g"], "v", k=32), kmv_state(b, ["g"], "v", k=32), ["g"], k=32
    )
    full = kmv_state(df, ["g"], "v", k=32)
    assert {(r.g, tuple(r.kmv)) for r in merged.collect()} == {
        (r.g, tuple(r.kmv)) for r in full.collect()
    }
    # estimate: sub-k groups exact, full sketches within ~3/sqrt(k)
    est = {r.g: r.est_distinct for r in kmv_estimate(full, ["g"], k=32).collect()}
    truth = {g: len({v for gg, v in rows if gg == g}) for g in (0, 1, 2)}
    for g in truth:
        assert abs(est[g] - truth[g]) / truth[g] < 0.6
    small = kmv_state(spark.createDataFrame([(0, "x"), (0, "y")], "g INT, v STRING"),
                      ["g"], "v", k=32)
    assert kmv_estimate(small, ["g"], k=32).first().est_distinct == 2
    # bounded build: the plan keeps a k-row heap, never full groups
    plan = kmv_state(df, ["g"], "v", k=32)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        kmv_state(df, ["g"], "v", k=1)
