"""User-journey analytics: funnel completion TIMES, cohort
retention, and market-basket association — "sequence over time per
user" reports. (``operators/funnel.py`` answers the sibling question
"how DEEP did each user get" as one subsequence fold; ``funnel_times``
answers WHEN each step was reached, which needs the chained
conditional-min formulation below.)

The reference expressed these as secondary-sorted reduce walks (sort by
(user, ts), scan each user's stream in order — cf. the SecondarySort
example family); both are re-expressed here as algebraic aggregates so
they partial-combine map-side and never materialize a per-user event
list:

- funnel: step k's entry time is ``min(ts WHERE type = step_k AND
  ts > t_{k-1})`` — K chained conditional-min aggregates (K is the
  funnel length, a constant), each one shuffle on the user key. No
  window, no per-user array.
- cohort retention: two integer week computations (epoch-day // 7) and
  one distinct-count per (cohort_week, offset) cell.

Determinism: funnel times are MINs of input timestamps (exact values,
no arithmetic); counts are integers; the week math is integer division
— every output is engine-exact, so both operators carry full value
oracles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel completion: for each user, the earliest timestamp
    at which they completed step k having completed steps 1..k-1 at
    STRICTLY increasing timestamps (the standard product-analytics
    funnel: a purchase before the first view does not count).

    Returns one row per user who completed step 1, with a nullable
    ``t_<step>`` column per step — NULL from the first uncompleted step
    on. Aggregate a step-count report with ``funnel_report``.

    Scale shape: step 1 is one groupBy(user).min; each later step is a
    semi-join of the (user, t_{k-1}) frame back to the events of that
    step's type (filter pushes the type predicate to the scan) and
    another conditional min — K-1 joins on the user key, all
    partial-combined, never a per-user sort.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"funnel needs at least 2 steps, got {steps}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    u, ty, ts = F.col(user_col), F.col(type_col), F.col(ts_col)

    cur = (
        df.filter(ty == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias(f"t_{steps[0]}"))
    )
    for prev, step in zip(steps, steps[1:]):
        ev = df.filter(ty == step).select(
            u.alias(user_col), ts.alias("__ts__")
        )
        nxt = (
            cur.join(ev, user_col, "left")
            .groupBy(user_col, *[f"t_{s}" for s in steps[: steps.index(step)]])
            .agg(
                F.min(
                    F.when(F.col("__ts__") > F.col(f"t_{prev}"), F.col("__ts__"))
                ).alias(f"t_{step}")
            )
        )
        cur = nxt
    return cur


def funnel_report(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """The funnel as a report: one row per step with the number of users
    who reached it (monotone non-increasing) — ``(step_idx, step,
    n_users)``. Integer counts: fully engine-portable."""
    per_user = funnel_times(df, steps, user_col, type_col, ts_col)
    counts = per_user.agg(
        *[
            F.count(F.col(f"t_{s}")).alias(f"t_{s}")
            for s in steps
        ]
    )
    # one tiny row -> explode into the report shape JVM-side
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"t_{s}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(pairs).alias("r")).select(
        "r.step_idx", "r.step", "r.n_users"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention triangle: cohort = each user's FIRST-activity
    period (epoch-day // period_days); for every (cohort, offset) cell,
    how many of that cohort's users were active ``offset`` periods
    later. (cohort_period, period_offset, n_users, cohort_size,
    retention) — retention is one exact int→double divide.

    Two aggregates: first-activity per user (groupBy-min), then a
    distinct-count per cell after a user-key join — no windows, integer
    week math (floor division, mirrored with FLOOR in oracles).
    """
    if period_days <= 0:
        raise ValueError(f"period_days must be positive, got {period_days}")
    period = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / 86400 / period_days)
    ).cast("bigint")
    act = df.select(F.col(user_col).alias("u"), period.alias("p")).distinct()
    first = act.groupBy("u").agg(F.min("p").alias("p0"))
    cells = (
        act.join(first, "u")
        .groupBy(
            F.col("p0").alias("cohort_period"),
            (F.col("p") - F.col("p0")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    size = first.groupBy(F.col("p0").alias("cohort_period")).agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        cells.join(size, "cohort_period")
        .select(
            "cohort_period",
            "period_offset",
            "n_users",
            "cohort_size",
            (
                F.col("n_users").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
    )


def market_basket(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Market-basket association mining (pairs): item pairs sharing a
    basket in ≥ ``min_support`` baskets, with support and lift —
    "customers who bought X also bought Y", the association-rule
    primitive (Agrawal & Srikant's apriori, restricted to pairs, which
    at 100 TB is the part you can afford exactly).

    The pair generation is a self-join WITHIN the basket key, so its
    fan-out is Σ basket_size² — bounded by the largest basket, never
    |items|²; the support floor then prunes before the item-stat joins.
    lift = (n_ab · n_baskets) / (n_a · n_b): all-integer inputs, one
    fixed exact-rounded double chain (engine-portable, like support).

    Output: (pa, pb, n_ab, support, lift) with pa < pb.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    li = df.select(
        F.col(basket_col).alias("__k__"), F.col(item_col).alias("__p__")
    ).distinct()
    n_baskets = li.agg(
        F.countDistinct("__k__").alias("n_orders")
    )
    item = li.groupBy(F.col("__p__").alias("p")).agg(
        F.count(F.lit(1)).alias("n_p")
    )
    a = li.select("__k__", F.col("__p__").alias("pa"))
    b = li.select("__k__", F.col("__p__").alias("pb"))
    pair = (
        a.join(b, "__k__")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    na = item.select(F.col("p").alias("pa"), F.col("n_p").alias("__na__"))
    nb = item.select(F.col("p").alias("pb"), F.col("n_p").alias("__nb__"))
    d = F.col("n_ab").cast("double")
    n = F.col("n_orders").cast("double")
    return (
        pair.join(na, "pa")
        .join(nb, "pb")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "pa",
            "pb",
            "n_ab",
            (d / n).alias("support"),
            (
                (d * n)
                / (F.col("__na__").cast("double") * F.col("__nb__").cast("double"))
            ).alias("lift"),
        )
    )


def rfm_segmentation(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    anchor=None,
    quartiles: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic lifecycle scoring the reference's reduce-walk users build by
    hand: per key, days-since-last-purchase, purchase count, and exact
    integer spend, each scored 1–4 against the population's exact
    quartiles (4 = best: most recent / most frequent / highest spend).

    One partial-combined aggregate builds the |customers|-sized RFM
    relation; the three quartile thresholds per axis come from ONE
    percentile aggregate over it (a 1-row relation, broadcast back), so
    the whole report is two shuffles regardless of order volume.

    Determinism contract: ``amount_col`` must be integer-typed (exact
    sums; rescale to cents upstream); recency is integer day arithmetic
    against ``anchor`` (defaults to the global max timestamp — computed
    in-plan, no driver round-trip); thresholds ride the
    percentile == quantile_cont bit-parity and scores are integer
    comparisons of exact values against them — every output column is
    engine-exact.  Scoring is ``1 + Σ (v > q_i)`` (strictly-greater, so
    ties land in the lower tile) with the recency axis reversed.

    Output: (key, recency_days, frequency, monetary, r_score, f_score,
    m_score, rfm) — rfm is the concatenated "444"-style segment code.
    """
    vt = dict(df.dtypes).get(amount_col)
    if vt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"rfm_segmentation needs an integer amount column (exact "
            f"sums), got {amount_col}: {vt} — rescale to cents"
        )
    qs = list(quartiles)
    if len(qs) != 3 or sorted(qs) != qs:
        raise ValueError(f"quartiles must be 3 ascending fractions, got {qs}")
    rfm = df.groupBy(F.col(key_col).alias("key")).agg(
        F.max(F.col(ts_col)).alias("__last__"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("bigint")).alias("monetary"),
    )
    if anchor is None:
        anch = rfm.agg(F.max("__last__").alias("__anchor__"))
        rfm = rfm.crossJoin(F.broadcast(anch))
        anchor_col = F.col("__anchor__")
    else:
        anchor_col = F.lit(anchor).cast(dict(df.dtypes)[ts_col])
    rfm = rfm.select(
        "key",
        F.datediff(anchor_col, F.col("__last__")).alias("recency_days"),
        "frequency",
        "monetary",
    )
    th = rfm.agg(
        *[
            F.percentile(F.col(c).cast("double"), F.lit(q)).alias(
                f"__{c}_q{i}__"
            )
            for c in ("recency_days", "frequency", "monetary")
            for i, q in enumerate(qs)
        ]
    )

    def asc_score(c):
        v = F.col(c).cast("double")
        s = F.lit(1)
        for i in range(3):
            s = s + F.when(v > F.col(f"__{c}_q{i}__"), 1).otherwise(0)
        return s

    def desc_score(c):
        v = F.col(c).cast("double")
        s = F.lit(1)
        for i in range(3):
            s = s + F.when(v < F.col(f"__{c}_q{i}__"), 1).otherwise(0)
        return s

    out = rfm.crossJoin(F.broadcast(th)).select(
        "key",
        "recency_days",
        "frequency",
        "monetary",
        desc_score("recency_days").alias("r_score"),
        asc_score("frequency").alias("f_score"),
        asc_score("monetary").alias("m_score"),
    )
    return out.withColumn(
        "rfm",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )
