"""Round-10 session-2 operator batch: Poisson bootstrap CI, DP count
release, embedding covariance, time-weighted average — semantics pinned
on hand-checkable fixtures plus the physical-plan gates for each
docstring's scale claim."""

import datetime

import pytest
from pyspark.sql import functions as F

from pangool_spark.data import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# poisson_bootstrap_ci


def test_poisson_weight_ladder_matches_inverse_cdf():
    """The hardcoded integer thresholds ARE floor(CDF_k * 2^31) of
    Poisson(1) — recompute from scratch."""
    import math

    from pangool_spark.operators.stats import _POISSON1_T

    c, p = 0.0, math.exp(-1.0)
    for k, t in enumerate(_POISSON1_T):
        c += p
        assert t == math.floor(c * (1 << 31)), f"threshold {k}"
        p /= k + 1


def test_poisson_bootstrap_ci_brackets_point_mean(spark):
    from pangool_spark.operators.stats import poisson_bootstrap_ci

    df = spark.createDataFrame(
        [("g", i, 100 + (i * 37) % 50) for i in range(400)],
        "grp STRING, id LONG, v LONG",
    )
    row = poisson_bootstrap_ci(df, ["grp"], "v", "id", replicates=40).first()
    assert row["n"] == 400
    assert row["ci_lo"] < row["point_mean"] < row["ci_hi"]
    # a mean of values in [100, 150) keeps its bootstrap CI inside the
    # data range, and the interval is nondegenerate
    assert 100.0 <= row["ci_lo"] < row["ci_hi"] <= 150.0


def test_poisson_bootstrap_ci_deterministic_rerun(spark):
    from pangool_spark.operators.stats import poisson_bootstrap_ci

    df = spark.createDataFrame(
        [("a" if i % 3 else "b", i, i % 97) for i in range(300)],
        "grp STRING, id LONG, v LONG",
    )
    a = sorted(map(tuple, poisson_bootstrap_ci(df, ["grp"], "v", "id").collect()))
    b = sorted(map(tuple, poisson_bootstrap_ci(df, ["grp"], "v", "id").collect()))
    assert a == b


def test_poisson_bootstrap_ci_validates_inputs(spark):
    from pangool_spark.operators.stats import poisson_bootstrap_ci

    df = spark.createDataFrame([("g", 1, 1.5)], "grp STRING, id LONG, v DOUBLE")
    with pytest.raises(ValueError, match="integer value column"):
        poisson_bootstrap_ci(df, ["grp"], "v", "id")
    ok = spark.createDataFrame([("g", 1, 1)], "grp STRING, id LONG, v LONG")
    with pytest.raises(ValueError, match="lo_rank"):
        poisson_bootstrap_ci(ok, ["grp"], "v", "id", replicates=10, lo_rank=5, hi_rank=5)


def test_poisson_bootstrap_one_data_pass(spark, sf_dir):
    """Docstring claim: one scan of the data, one partial-combined
    aggregate over the exploded replicates — NOT 40 passes."""
    from pangool_spark.operators.stats import poisson_bootstrap_ci

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    plan = _plan(
        poisson_bootstrap_ci(ev, ["event_type"], "cents", "event_id")
    )
    assert plan.count("Scan parquet") <= 2  # point + replicate branches
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # partial aggregation before the shuffle of replicate states
    assert "partial" in plan.lower()


# ---------------------------------------------------------------------------
# dp_count_release


def test_dp_release_noise_bounded_and_deterministic(spark):
    from pangool_spark.operators.profile import dp_count_release

    df = spark.createDataFrame(
        [(i % 20, i) for i in range(2000)], "k LONG, id LONG"
    )
    rel = dp_count_release(df, ["k"], release_tag="t1")
    rows = {r["k"]: r["noisy_count"] for r in rel.collect()}
    assert len(rows) == 20
    for k, noisy in rows.items():
        true = 100
        assert abs(noisy - true) <= 12, f"noise out of ladder range at {k}"
    again = {r["k"]: r["noisy_count"] for r in dp_count_release(
        df, ["k"], release_tag="t1").collect()}
    assert rows == again  # reproducible release


def test_dp_release_tag_changes_noise(spark):
    from pangool_spark.operators.profile import dp_count_release

    df = spark.createDataFrame(
        [(i % 50, i) for i in range(5000)], "k LONG, id LONG"
    )
    a = {r["k"]: r["noisy_count"] for r in dp_count_release(df, ["k"], "ra").collect()}
    b = {r["k"]: r["noisy_count"] for r in dp_count_release(df, ["k"], "rb").collect()}
    assert a != b  # 50 groups: P(identical draws) ~ (best case) vanishing


def test_dp_release_clamps_at_zero(spark):
    from pangool_spark.operators.profile import dp_count_release

    # singleton groups: count 1 + noise as low as -12 would go negative
    df = spark.createDataFrame([(i, i) for i in range(500)], "k LONG, id LONG")
    rel = dp_count_release(df, ["k"], release_tag="clamp")
    assert rel.filter(F.col("noisy_count") < 0).count() == 0
    unclamped = dp_count_release(
        df, ["k"], release_tag="clamp", clamp_nonnegative=False
    )
    assert unclamped.filter(F.col("noisy_count") < 0).count() > 0


def test_dp_release_never_emits_true_count(spark):
    from pangool_spark.operators.profile import dp_count_release

    df = spark.createDataFrame([(1, 1)], "k LONG, id LONG")
    assert dp_count_release(df, ["k"]).columns == ["k", "noisy_count"]


# ---------------------------------------------------------------------------
# embedding_covariance


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from pangool_spark.operators.similarity import embedding_covariance

    rng = np.random.default_rng(7)
    mat = rng.normal(0, 0.3, size=(500, 4)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {
        (r["i"], r["j"]): r
        for r in embedding_covariance(df, dims=[1, 2, 3, 4]).collect()
    }
    assert len(got) == 10
    # quantization to 1e-5 units -> covariance error bound ~1e-5-ish
    q = np.round(mat.astype("float64") * 1e5) / 1e5
    ref = np.cov(q, rowvar=False, bias=True)
    for (i, j), r in got.items():
        assert r["n"] == 500
        assert r["cov"] == pytest.approx(ref[i - 1, j - 1], abs=1e-9)
        assert r["mean_i"] == pytest.approx(q[:, i - 1].mean(), abs=1e-12)


def test_embedding_covariance_single_agg_pass(spark, sf_dir):
    from pangool_spark.operators.similarity import embedding_covariance

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan(embedding_covariance(emb, dims=list(range(1, 9))))
    # docstring claim: ONE aggregate pass — one scan, no join, no
    # per-row explode (the only Generate is over the 36 literal structs
    # of the 1-row aggregate result)
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_embedding_covariance_validates_dims(spark):
    from pangool_spark.operators.similarity import embedding_covariance

    df = spark.createDataFrame([(1, [1.0])], "vec_id LONG, embedding ARRAY<FLOAT>")
    with pytest.raises(ValueError, match="distinct"):
        embedding_covariance(df, dims=[1, 1])
    with pytest.raises(ValueError, match="distinct"):
        embedding_covariance(df, dims=[])


# ---------------------------------------------------------------------------
# time_weighted_avg


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_twap_hand_computed(spark):
    from pangool_spark.operators.windows import time_weighted_avg

    # u1 holds 100 for 10s, then 200 for 30s -> twap = (1000+6000)/40 = 175
    # u2 has one observation -> NULL twap, zero time
    df = spark.createDataFrame(
        [
            (1, _ts(0), 100, 1),
            (1, _ts(10), 200, 2),
            (1, _ts(40), 999, 3),  # terminal: no successor, excluded
            (2, _ts(0), 50, 4),
        ],
        "user_id LONG, ts TIMESTAMP, v LONG, event_id LONG",
    )
    rows = {
        r["user_id"]: r
        for r in time_weighted_avg(
            df, "user_id", "ts", "v", tiebreak_cols="event_id"
        ).collect()
    }
    assert rows[1]["n_obs"] == 3
    assert rows[1]["total_s"] == 40
    assert rows[1]["twap"] == pytest.approx(175.0)
    assert rows[2]["n_obs"] == 1
    assert rows[2]["total_s"] == 0
    assert rows[2]["twap"] is None


def test_twap_differs_from_plain_avg_on_bursts(spark):
    """The reason the operator exists: a burst of short-held readings
    must not dominate the mean."""
    from pangool_spark.operators.windows import time_weighted_avg

    rows = [(1, _ts(i), 1000, i) for i in range(10)]  # 10 bursty seconds @1000
    rows.append((1, _ts(10), 0, 10))  # then 0 held for an hour
    rows.append((1, _ts(3610), 0, 11))
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, v LONG, event_id LONG")
    r = time_weighted_avg(df, "user_id", "ts", "v", "event_id").first()
    plain_avg = 1000 * 10 / 12
    assert r["twap"] == pytest.approx(10 * 1000 / 3610)  # time-weighted
    assert r["twap"] < plain_avg / 100


def test_twap_validates_value_type(spark):
    from pangool_spark.operators.windows import time_weighted_avg

    df = spark.createDataFrame(
        [(1, _ts(0), 1.5, 1)], "user_id LONG, ts TIMESTAMP, v DOUBLE, event_id LONG"
    )
    with pytest.raises(ValueError, match="integer value column"):
        time_weighted_avg(df, "user_id", "ts", "v", "event_id")


def test_twap_single_exchange(spark, sf_dir):
    from pangool_spark.operators.windows import time_weighted_avg

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    plan = _plan(time_weighted_avg(ev, "user_id", "ts", "cents", "event_id"))
    # docstring claim: the groupBy reuses the lead-window exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "EvalPython" not in plan


def test_geometric_ladder_matches_inverse_cdf():
    """The hardcoded discrete-Laplace thresholds ARE floor(CDF_k * 2^31)
    of the renormalized two-sided geometric at alpha = e^-1 — recompute
    from scratch."""
    import math

    from pangool_spark.operators.profile import _GEOM1_T

    a = math.exp(-1.0)
    p0 = (1 - a) / (1 + a)
    ks = list(range(-12, 13))
    probs = [p0 * a ** abs(k) for k in ks]
    s = sum(probs)
    cum = 0.0
    for (k, t), pr in zip(_GEOM1_T, probs):
        cum += pr
        assert t == math.floor(cum / s * (1 << 31)), f"threshold k={k}"
    assert len(_GEOM1_T) == 24  # k = -12..11; k=12 is the ELSE branch


def test_cms_join_size_partial_agg_no_cartesian(spark):
    from pangool_spark.operators.sketch import cms_join_size, count_min_sketch

    df = spark.createDataFrame([(str(i % 9),) for i in range(90)], "k STRING")
    ga = count_min_sketch(df, "k", width=64, depth=4)
    gb = count_min_sketch(df, "k", width=64, depth=4)
    plan = (
        cms_join_size(ga, gb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()  # grid build is map-side combined
    assert "EvalPython" not in plan
