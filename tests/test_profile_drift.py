"""grouped_histogram / category_drift / grouped_robust_outliers vs
Python references — including the masking case where classic z-scores
miss a spike cluster but median/MAD flags it."""

import math
import random

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.profile import category_drift, grouped_histogram
from pangool_spark.operators.stats import grouped_outliers, grouped_robust_outliers


def test_histogram_matches_python(spark):
    rng = random.Random(11)
    vals = [rng.uniform(-10, 110) for _ in range(500)] + [None, -10.0, 110.0]
    df = spark.createDataFrame([(v,) for v in vals], "y DOUBLE")
    got = {r.bin: (r.bin_lo, r.n) for r in grouped_histogram(df, "y", 0.0, 100.0, 10).collect()}
    w = 10.0
    want = {}
    for v in vals:
        if v is None or not (0.0 <= v < 100.0):
            continue
        b = math.floor((v - 0.0) / w)
        want[b] = want.get(b, 0) + 1
    assert {b: n for b, (_, n) in got.items()} == want
    for b, (bin_lo, _) in got.items():
        assert bin_lo == 0.0 + float(b) * w
    with pytest.raises(ValueError, match="n_bins"):
        grouped_histogram(df, "y", 0.0, 100.0, 0)
    with pytest.raises(ValueError, match="hi > lo"):
        grouped_histogram(df, "y", 5.0, 5.0, 3)
    # grouped form
    df2 = spark.createDataFrame([(i % 2, float(i % 10)) for i in range(100)], "g INT, y DOUBLE")
    rows = grouped_histogram(df2, "y", 0.0, 10.0, 5, ["g"]).collect()
    assert sum(r.n for r in rows) == 100
    assert all(r.g in (0, 1) for r in rows)


def test_category_drift_chi2(spark):
    ref = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20, "cat STRING"
    )
    cur = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 60 + [("d",)] * 30, "cat STRING"
    )
    got = {r.category: r for r in category_drift(ref, cur, "cat").collect()}
    assert set(got) == {"a", "b", "c", "d"}
    # expected = n_cur_total * ref_share
    assert got["a"].expected == 100.0 * (50.0 / 100.0)
    assert got["a"].chi2_term == (10.0 - 50.0) ** 2 / 50.0
    assert got["c"].n_cur == 0 and got["c"].chi2_term == (0.0 - 20.0) ** 2 / 20.0
    # new category: no expected, NULL term (schema alarm, not a number)
    assert got["d"].n_ref == 0 and got["d"].chi2_term is None and got["d"].expected is None


def test_robust_outliers_resist_masking(spark):
    # 40 inliers around 0 plus a CLUSTER of 5 spikes at 1000: the spikes
    # inflate sigma so classic z=3 misses them, but median/MAD flags all 5
    rng = random.Random(5)
    inliers = [float(rng.randint(-5, 5)) for _ in range(40)]
    rows = [(0, v) for v in inliers + [1000.0] * 5]
    df = spark.createDataFrame(rows, "g INT, y DOUBLE")
    classic = grouped_outliers(df, ["g"], "y", z=3.0).collect()
    robust = grouped_robust_outliers(df, ["g"], "y", k=3.5).collect()
    assert len(classic) < 5  # masking: sigma ~ 300, spikes z ~ 2.9
    assert sorted(r.y for r in robust) == [1000.0] * 5
    med = sorted(inliers + [1000.0] * 5)[22]  # odd n=45 -> exact middle
    mad_ref = sorted(abs(v - med) for v in inliers + [1000.0] * 5)[22]
    assert robust[0].robust_z == abs(1000.0 - med) / (1.4826 * mad_ref)


def test_robust_outliers_mad_zero_and_validation(spark):
    # >half identical values -> MAD 0 -> flag nothing (not everything)
    df = spark.createDataFrame(
        [(0, 5.0)] * 10 + [(0, 99.0)], "g INT, y DOUBLE"
    )
    assert grouped_robust_outliers(df, ["g"], "y").count() == 0
    with pytest.raises(ValueError, match="group column"):
        grouped_robust_outliers(df, [], "y")
    with pytest.raises(ValueError, match="k must be"):
        grouped_robust_outliers(df, ["g"], "y", k=-1)


def test_winsorize(spark):
    from pangool_spark.operators.stats import winsorize

    vals = sorted(float(v) for v in range(1, 101))
    df = spark.createDataFrame([(0, v) for v in vals], "g INT, y DOUBLE")
    # exact interpolated percentiles of 1..100 at 5%/95%
    lo = 1 + 0.05 * 99
    hi = 1 + 0.95 * 99
    got = {r.y: r.y_w for r in winsorize(df, "y", 0.05, 0.95, ["g"]).collect()}
    assert len(got) == 100
    for y, y_w in got.items():
        assert y_w == min(max(y, lo), hi)
    # ungrouped form broadcasts one global bound row
    assert winsorize(df, "y", 0.05, 0.95).count() == 100
    with pytest.raises(ValueError, match="lo_q"):
        winsorize(df, "y", 0.9, 0.1)
    with pytest.raises(ValueError, match="already has"):
        winsorize(df.withColumn("y_w", F.lit(1.0)), "y")


def test_equidepth_histogram(spark):
    from pangool_spark.operators.profile import equidepth_histogram

    vals = [float(v) for v in range(1, 101)]  # uniform 1..100
    df = spark.createDataFrame([(v,) for v in vals], "y DOUBLE")
    rows = {r.bin: r for r in equidepth_histogram(df, "y", 4).collect()}
    assert set(rows) == {0, 1, 2, 3}
    # equal depth on unique uniform values (edges are interpolated
    # percentiles, so interior bins split 25/25/25/25)
    assert [rows[b].n for b in range(4)] == [25, 25, 25, 25]
    # edges: exact interpolated percentiles of 1..100
    assert rows[0].lo == 1.0 and rows[3].hi == 100.0
    assert rows[0].hi == rows[1].lo == 1 + 0.25 * 99
    # heavy tail: one hot value can't straddle an edge
    hot = spark.createDataFrame([(1.0,)] * 90 + [(v,) for v in vals[:10]], "y DOUBLE")
    got = {r.bin: r.n for r in equidepth_histogram(hot, "y", 4).collect()}
    assert sum(got.values()) == 100
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_bins"):
        equidepth_histogram(df, "y", 0)
    # grouped form
    g = spark.createDataFrame([(i % 2, float(i)) for i in range(100)], "g INT, y DOUBLE")
    rows2 = equidepth_histogram(g, "y", 5, ["g"]).collect()
    assert sum(r.n for r in rows2) == 100 and {r.g for r in rows2} == {0, 1}
