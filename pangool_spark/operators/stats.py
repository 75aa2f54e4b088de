"""Grouped closed-form statistics — per-key model fits that reduce to
algebraic sums, so they run as ONE partial-combined aggregate (the same
map-side-combine shape as any groupBy-sum) and never need an iterative
solver or a per-key data pass.

The 100 TB shape: a "fit a trend per customer / per sensor / per shard"
step is embarrassingly aggregable — Σx, Σy, Σxy, Σx² per key — yet is
routinely implemented as a per-key pandas loop. Here the five sums are
JVM-side aggregate expressions (whole-stage codegen, partial merge), and
the closed-form solve is a handful of scalar doubles per GROUP, not per
row.

Determinism contract: with INTEGER x and y the five sums are exact
64-bit integers — order-independent, engine-exact, and the downstream
double formula is a fixed sequence of IEEE ops, so slope/intercept are
bit-replicable in any engine (the value-oracle path; rescale measures
to integers — days, cents, millis — to use it). With fractional inputs
the sums run as decimal(38, scale) — still order-independent WITHIN
Spark (cluster reruns are bit-identical), but the final decimal→double
conversion is engine-internal rounding, so cross-engine comparisons of
that path are rows-only. This is measured behavior, not caution: a
Σ(x·y) with 12 fractional digits carries more significant digits than a
double, and Spark and DuckDB round the excess differently.
"""

from __future__ import annotations

import functools
import operator as _operator
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _join_null_safe(
    left: DataFrame, right: DataFrame, keys: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Equi-join on ``keys`` with NULL-safe equality per key. GROUP BY
    keeps NULL as a regular key value everywhere in this module, so a
    join that reassembles per-group branches must too — the plain
    list-of-names join form compiles to ``=`` and silently drops
    NULL-keyed groups (the t_closeness lesson, applied to joins).
    Output keeps ONE copy of each key (left side), mirroring the
    list-of-names form it replaces."""
    l, r = left.alias("__jl__"), right.alias("__jr__")
    cond = functools.reduce(
        _operator.and_,
        [
            F.col(f"__jl__.{k}").eqNullSafe(F.col(f"__jr__.{k}"))
            for k in keys
        ],
    )
    keep = [c for c in right.columns if c not in set(keys)]
    return l.join(r, cond, how).select(
        "__jl__.*", *[F.col(f"__jr__.{c}") for c in keep]
    )


def grouped_linreg(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    scale: int = 12,
) -> DataFrame:
    """Per-group simple linear regression y = slope·x + intercept by the
    closed-form least-squares solution:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    One aggregate pass; NULL x or y rows are excluded pairwise. Groups
    with n < 2 or zero x-variance emit NULL slope/intercept (a vertical
    or single-point fit has no line).

    If BOTH columns are integer-typed, sums are exact int64 (the
    engine-portable path — see module docstring); keep per-group Σx²
    and Σxy under 2⁵³ (rescale x to days/epochs-of-interest) so their
    double images stay exact. Otherwise sums run as
    decimal(38, ``scale``), holding |values| up to 10^(38−scale).

    Output: (*group_cols, n, slope, intercept).
    """
    if not group_cols:
        raise ValueError("grouped_linreg needs at least one group column")
    if not 0 <= scale <= 37:
        raise ValueError(f"scale must be in [0, 37], got {scale}")
    types = dict(df.dtypes)
    exact = (
        types.get(x_col) in _INT_TYPES and types.get(y_col) in _INT_TYPES
    )
    sum_t = "bigint" if exact else f"decimal(38,{scale})"
    x = F.col(x_col) if exact else F.col(x_col).cast("double")
    y = F.col(y_col) if exact else F.col(y_col).cast("double")
    both = F.when(x.isNotNull() & y.isNotNull(), True)
    # each TERM is exact (integer path) or one exact-rounded double op
    # (decimal path) before the order-independent sum
    agg = df.groupBy(*group_cols).agg(
        F.count(F.when(both, 1)).alias("n"),
        F.sum(F.when(both, x).cast(sum_t)).cast("double").alias("__sx__"),
        F.sum(F.when(both, y).cast(sum_t)).cast("double").alias("__sy__"),
        F.sum(F.when(both, x * y).cast(sum_t)).cast("double").alias("__sxy__"),
        F.sum(F.when(both, x * x).cast(sum_t)).cast("double").alias("__sxx__"),
    )
    n = F.col("n").cast("double")
    denom = n * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__")
    slope = F.when(
        (F.col("n") >= 2) & (denom != 0.0),
        (n * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__")) / denom,
    )
    intercept = F.when(
        slope.isNotNull(),
        (F.col("__sy__") - slope * F.col("__sx__")) / n,
    )
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def grouped_corr(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    scale: int = 12,
) -> DataFrame:
    """Per-group Pearson correlation by the same one-pass algebraic-sum
    reduction as ``grouped_linreg``:

        r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))

    NULL x or y rows are excluded pairwise; groups with n < 2 or zero
    variance on either axis emit NULL. Integer-typed inputs take the
    exact-int64-sum path (engine-portable — sqrt is a single
    exact-rounded IEEE op, so even r hash-matches cross-engine);
    fractional inputs use decimal(38, ``scale``) sums (deterministic
    within Spark, engine-internal across engines — module docstring).

    Output: (*group_cols, n, corr).
    """
    if not group_cols:
        raise ValueError("grouped_corr needs at least one group column")
    if not 0 <= scale <= 37:
        raise ValueError(f"scale must be in [0, 37], got {scale}")
    types = dict(df.dtypes)
    exact = (
        types.get(x_col) in _INT_TYPES and types.get(y_col) in _INT_TYPES
    )
    sum_t = "bigint" if exact else f"decimal(38,{scale})"
    x = F.col(x_col) if exact else F.col(x_col).cast("double")
    y = F.col(y_col) if exact else F.col(y_col).cast("double")
    both = F.when(x.isNotNull() & y.isNotNull(), True)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.when(both, 1)).alias("n"),
        F.sum(F.when(both, x).cast(sum_t)).cast("double").alias("__sx__"),
        F.sum(F.when(both, y).cast(sum_t)).cast("double").alias("__sy__"),
        F.sum(F.when(both, x * y).cast(sum_t)).cast("double").alias("__sxy__"),
        F.sum(F.when(both, x * x).cast(sum_t)).cast("double").alias("__sxx__"),
        F.sum(F.when(both, y * y).cast(sum_t)).cast("double").alias("__syy__"),
    )
    n = F.col("n").cast("double")
    vx = n * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__")
    vy = n * F.col("__syy__") - F.col("__sy__") * F.col("__sy__")
    corr = F.when(
        (F.col("n") >= 2) & (vx > 0.0) & (vy > 0.0),
        (n * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__"))
        / F.sqrt(vx * vy),
    )
    return agg.select(*group_cols, "n", corr.alias("corr"))


def grouped_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    z: float = 3.0,
    scale: int = 12,
) -> DataFrame:
    """Per-group z-score outlier flagging: rows where
    ``|y − μ_g| > z·σ_g`` (population σ), computed as one algebraic
    aggregate (n, Σy, Σy² per group) joined back — never a per-group
    pass or a sort. NULL values are never outliers; groups with n < 2
    or zero variance flag nothing.

    The join back is a plain equi-join on the group key: the aggregate
    side has one row per group, so AQE broadcast-picks it whenever the
    group cardinality is small; at 100 TB with high-cardinality keys it
    degrades to a co-partitioned shuffle join, never a window sort.

    Determinism: with integer-typed ``value_col`` the three sums are
    exact int64, and μ, σ², sqrt, the comparison, and the emitted
    zscore are each single exact-rounded IEEE double ops — the whole
    output (rows AND zscore values) is engine-portable, same contract
    as ``grouped_linreg``. Fractional inputs take decimal(38, ``scale``)
    sums: deterministic within Spark, rows-only across engines.

    Output: the flagged input rows + ``zscore`` (double).
    """
    if not group_cols:
        raise ValueError("grouped_outliers needs at least one group column")
    if z <= 0.0:
        raise ValueError(f"z must be positive, got {z}")
    if "zscore" in df.columns:
        raise ValueError("input already has a 'zscore' column")
    stats = outlier_stats(df, group_cols, value_col, scale)
    return score_outliers(df, stats, group_cols, value_col, z)


def outlier_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    scale: int = 12,
) -> DataFrame:
    """The reference-stats half of ``grouped_outliers``: one algebraic
    aggregate → (*group_cols, __n__, __sy__, __syy__). Persist or
    broadcast it to score OTHER data against these groups' baselines —
    ``streaming.stream_outliers`` joins it stream-static (the model-
    scoring shape: stats from yesterday's batch, scoring on the live
    stream)."""
    types = dict(df.dtypes)
    exact = types.get(value_col) in _INT_TYPES
    sum_t = "bigint" if exact else f"decimal(38,{scale})"
    y = F.col(value_col) if exact else F.col(value_col).cast("double")
    return df.groupBy(*group_cols).agg(
        F.count(y).alias("__n__"),
        F.sum(y.cast(sum_t)).cast("double").alias("__sy__"),
        F.sum((y * y).cast(sum_t)).cast("double").alias("__syy__"),
    )


def score_outliers(
    df: DataFrame,
    stats: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Score rows against precomputed ``outlier_stats`` baselines: keep
    rows with ``|y − μ| > z·σ`` and attach the zscore. Works on batch
    AND streaming ``df`` (the join is stream-static when ``df`` is a
    stream); exact-int inputs keep the whole op chain engine-portable
    (``grouped_outliers`` contract)."""
    types = dict(df.dtypes)
    y = (
        F.col(value_col)
        if types.get(value_col) in _INT_TYPES
        else F.col(value_col).cast("double")
    )
    n = F.col("__n__").cast("double")
    # fixed IEEE op sequence, mirrored verbatim in oracle SQL
    mu = F.col("__sy__") / n
    var = (n * F.col("__syy__") - F.col("__sy__") * F.col("__sy__")) / (n * n)
    sigma = F.sqrt(var)
    zscore = (y - mu) / sigma
    return (
        df.join(stats, list(group_cols))
        .filter(
            (F.col("__n__") >= 2)
            & (var > 0.0)
            & y.isNotNull()
            & (F.abs(y - mu) > F.lit(float(z)) * sigma)
        )
        .select(*df.columns, zscore.alias("zscore"))
    )


def grouped_robust_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 3.5,
) -> DataFrame:
    """Per-group ROBUST outlier flagging via the median/MAD rule:
    ``|y − median| > k · 1.4826 · MAD`` (MAD = median absolute
    deviation; 1.4826 scales it to σ under normality — Iglewicz &
    Hoaglin's modified z-score, default k=3.5). Unlike
    ``grouped_outliers`` the thresholds are unmoved by the outliers
    themselves — a planted 10⁶ spike inflates σ and masks its siblings,
    but cannot move the median.

    Two exact-percentile aggregates (median, then MAD of residuals)
    with a group-key join between them — no windows. Spark's exact
    ``percentile`` matches DuckDB's ``quantile_cont`` bit-for-bit
    (property-pinned in tests/test_property_percentile.py), residuals
    and the comparison are single exact-rounded IEEE ops, and
    ``k·1.4826`` is folded into ONE Python-computed literal mirrored
    verbatim in oracle SQL — the whole output is value-oracle-able.

    Exact per-group percentile buffers a group's values in executor
    memory — the documented cost of exactness; for heavy-tailed group
    sizes at 100 TB use ``sampling.approx_quantiles_sampled`` medians
    instead. Groups with MAD = 0 (≥ half the values identical) flag
    NOTHING — the rule would otherwise flag every non-median value.

    Output: flagged input rows + ``robust_z`` (double).
    """
    if not group_cols:
        raise ValueError("grouped_robust_outliers needs a group column")
    if k <= 0.0:
        raise ValueError(f"k must be positive, got {k}")
    if "robust_z" in df.columns:
        raise ValueError("input already has a 'robust_z' column")
    gc = list(group_cols)
    y = F.col(value_col).cast("double")
    med = df.groupBy(*gc).agg(
        F.percentile(y, F.lit(0.5)).alias("__med__")
    )
    with_med = df.join(med, gc)
    resid = F.abs(y - F.col("__med__"))
    mad = with_med.groupBy(*gc).agg(
        F.percentile(resid, F.lit(0.5)).alias("__mad__")
    )
    c = float(k) * 1.4826
    return (
        with_med.join(mad, gc)
        .filter(
            y.isNotNull()
            & (F.col("__mad__") > 0.0)
            & (resid > F.lit(c) * F.col("__mad__"))
        )
        .select(
            *df.columns,
            (resid / (F.lit(1.4826) * F.col("__mad__"))).alias("robust_z"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    group_cols: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Winsorization: CLIP values to their (per-group) [lo_q, hi_q]
    exact-percentile band — the ML-preprocessing step that tames heavy
    tails without dropping rows (``sampling.quantile_filter`` is the
    dropping sibling). One percentile aggregate (one row per group,
    broadcast-sized join back), then ``least(greatest(y, lo), hi)`` —
    all ops inside the percentile==quantile_cont bit-parity plus two
    exact comparisons, so clipped values carry full hash oracles.

    Output: input columns + ``out_col`` (default ``<value_col>_w``),
    NULL where the value is NULL.
    """
    if not 0.0 <= lo_q < hi_q <= 1.0:
        raise ValueError(f"need 0 <= lo_q < hi_q <= 1, got ({lo_q}, {hi_q})")
    out_col = out_col or f"{value_col}_w"
    if out_col in df.columns:
        raise ValueError(f"input already has a {out_col!r} column")
    y = F.col(value_col).cast("double")
    aggs = [
        F.percentile(y, F.lit(float(lo_q))).alias("__lo__"),
        F.percentile(y, F.lit(float(hi_q))).alias("__hi__"),
    ]
    gc = list(group_cols)
    if gc:
        bounds = df.groupBy(*gc).agg(*aggs)
        joined = df.join(bounds, gc)
    else:
        joined = df.crossJoin(F.broadcast(df.agg(*aggs)))
    return joined.select(
        *df.columns,
        F.least(F.greatest(y, F.col("__lo__")), F.col("__hi__")).alias(out_col),
    )


def welch_ttest(
    df: DataFrame,
    group_cols: Sequence[str],
    arm_col: str,
    value_col: str,
    arm_a,
    arm_b,
) -> DataFrame:
    """Per-group Welch two-sample t-test (unequal variances) — the A/B
    experiment readout, reduced to the same one-pass algebraic-sum shape
    as ``grouped_linreg``: per (group, arm) we need only n, Σx, Σx², so
    the whole test is ONE partial-combined aggregate over the metric
    table, a handful of scalar doubles per experiment after it.

        t  = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b)
        df = (v_a/n_a + v_b/n_b)² /
             ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))

    Rows whose arm is neither ``arm_a`` nor ``arm_b`` or whose value is
    NULL are ignored. Groups where either arm has n < 2 or the pooled
    standard error is 0 emit NULL t/df (no test exists).

    Engine-portable when ``value_col`` is integer-typed (rescale the
    metric to cents/millis first): the three sums per arm are exact
    int64, and the t/df formulas are a fixed chain of IEEE double ops
    (each division/multiply/sqrt exactly rounded), so the statistics
    hash-match cross-engine bit-for-bit — write the SAME expression
    order in any oracle. Fractional inputs fall back to
    decimal(38,12) sums: deterministic within Spark, rows-only across
    engines (module docstring).

    The 100 TB shape: one shuffle keyed by the group columns with full
    map-side combine — arm conditionals are projections, never a second
    pass; no window, no per-key collect.

    Output: (*group_cols, n_a, n_b, mean_a, mean_b, t_stat, df_w).
    """
    if not group_cols:
        raise ValueError("welch_ttest needs at least one group column")
    if arm_a == arm_b:
        raise ValueError("arm_a and arm_b must differ")
    types = dict(df.dtypes)
    if arm_col not in types or value_col not in types:
        raise ValueError(f"missing column: {arm_col!r} or {value_col!r}")
    exact = types[value_col] in _INT_TYPES
    sum_t = "bigint" if exact else "decimal(38,12)"
    x = F.col(value_col) if exact else F.col(value_col).cast("double")
    in_a = (F.col(arm_col) == F.lit(arm_a)) & x.isNotNull()
    in_b = (F.col(arm_col) == F.lit(arm_b)) & x.isNotNull()
    agg = df.groupBy(*group_cols).agg(
        F.count(F.when(in_a, 1)).alias("n_a"),
        F.count(F.when(in_b, 1)).alias("n_b"),
        F.sum(F.when(in_a, x).cast(sum_t)).cast("double").alias("__sa__"),
        F.sum(F.when(in_b, x).cast(sum_t)).cast("double").alias("__sb__"),
        F.sum(F.when(in_a, x * x).cast(sum_t)).cast("double").alias("__saa__"),
        F.sum(F.when(in_b, x * x).cast(sum_t)).cast("double").alias("__sbb__"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sa, sb = F.col("__sa__"), F.col("__sb__")
    saa, sbb = F.col("__saa__"), F.col("__sbb__")
    # every sub-expression below is re-stated (not bound to a python var
    # reused across columns) so the oracle can mirror the exact op order
    va = (saa - sa * sa / na) / (na - F.lit(1.0))
    vb = (sbb - sb * sb / nb) / (nb - F.lit(1.0))
    se2 = va / na + vb / nb
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0.0)
    t = F.when(ok, (sa / na - sb / nb) / F.sqrt(se2))
    df_w = F.when(
        ok,
        (se2 * se2)
        / (
            (va / na) * (va / na) / (na - F.lit(1.0))
            + (vb / nb) * (vb / nb) / (nb - F.lit(1.0))
        ),
    )
    return agg.select(
        *group_cols,
        "n_a",
        "n_b",
        F.when(F.col("n_a") >= 1, sa / na).alias("mean_a"),
        F.when(F.col("n_b") >= 1, sb / nb).alias("mean_b"),
        t.alias("t_stat"),
        df_w.alias("df_w"),
    )


def cusum(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    target: int,
    slack: int,
    threshold: int,
) -> DataFrame:
    """Two-sided CUSUM change-point scores per key (Page 1954) — the
    classic drift detector: the upper chart accumulates excess above
    ``target + slack``, the lower chart deficit below ``target −
    slack``, both clamped at 0, alarming when either exceeds
    ``threshold``.

    The recursion ``s_i = max(0, s_{i−1} + d_i)`` is NOT computed as a
    per-key fold: by the Lindley/reflection identity it equals

        s_i = prefix_i − min(0, min_{j≤i} prefix_j)

    so the whole detector is two running-sum + running-min window
    passes over ONE per-key sort — no per-key collect, no UDF, and the
    running state never materializes (Spark's incremental window frame
    keeps O(1) per row). Skew bound = one key's rows in one task, the
    same contract every per-key window op here accepts.

    All inputs must be INTEGERS (rescale the metric to cents/millis):
    prefix sums are then exact int64, making scores and alarm flags
    engine-exact — the fully value-oracle-able path. ``order_by`` must
    be unique per key for a deterministic series order. NULL keys or
    values are dropped.

    Output: input keys + order_by columns + (value, cusum_hi,
    cusum_lo, alarm) per observation, scores in metric units.
    """
    if not keys or not order_by:
        raise ValueError("cusum needs key and order columns")
    if slack < 0 or threshold <= 0:
        raise ValueError("need slack >= 0 and threshold > 0")
    types = dict(df.dtypes)
    ints = {"tinyint", "smallint", "int", "bigint"}
    if types.get(value_col) not in ints:
        raise ValueError(
            f"value_col {value_col!r} must be integer-typed, got "
            f"{types.get(value_col)!r} — rescale to cents/millis first"
        )
    keep = F.col(value_col).isNotNull()
    for k in keys:
        keep = keep & F.col(k).isNotNull()
    x = F.col(value_col).cast("bigint")
    base = df.filter(keep).select(
        *keys, *order_by,
        x.alias("value"),
        (x - F.lit(int(target) + int(slack))).alias("__dh__"),
        (F.lit(int(target) - int(slack)) - x).alias("__dl__"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = base.select(
        *keys, *order_by, "value",
        F.sum("__dh__").over(w).alias("__ph__"),
        F.sum("__dl__").over(w).alias("__pl__"),
    )
    s_hi = F.col("__ph__") - F.least(F.lit(0), F.min("__ph__").over(w))
    s_lo = F.col("__pl__") - F.least(F.lit(0), F.min("__pl__").over(w))
    h = F.lit(int(threshold))
    return pre.select(
        *keys, *order_by, "value",
        s_hi.alias("cusum_hi"),
        s_lo.alias("cusum_lo"),
        ((s_hi > h) | (s_lo > h)).alias("alarm"),
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    prior_weight: float = 20.0,
    loo: bool = False,
    out_col: str = "te",
) -> DataFrame:
    """Smoothed TARGET ENCODING of a categorical column (Micci-Barreca
    SIGKDD Expl. 2001) — the tabular-ML feature that replaces a category
    with the shrunk mean of the target:

        enc(c) = (S_c + w·μ) / (n_c + w)

    with S_c/n_c the category's target sum/count, μ the global mean and
    ``w`` the prior weight (rare categories shrink toward μ, huge ones
    barely move). ``loo=True`` returns PER-ROW leave-one-out encodings
    (S_c − y_i + w·μ) / (n_c − 1 + w) — the standard anti-leakage form
    for encoding the training split itself.

    Determinism contract (the ``grouped_linreg`` lesson): ``target_col``
    must be INTEGER-typed (rescale money to cents upstream) so S_c and
    the global sums stay exact int64; μ and every encoding are then a
    fixed chain of exact-rounded double ops — bit-identical in any
    engine and under any partitioning. NULL targets are excluded from
    sums and counts; NULL categories form their own group (they are a
    real category in production data).

    Shape: one partial-combined aggregate over categories + a one-row
    global aggregate broadcast into the projection; ``loo`` adds one
    broadcast-friendly join back to the rows. Output: per-category
    (cat_col, n, sum, te) — or the input rows + ``out_col`` when
    ``loo=True``.
    """
    if prior_weight < 0:
        raise ValueError(f"prior_weight must be >= 0, got {prior_weight}")
    t = F.col(target_col)
    dt = dict(df.dtypes).get(target_col)
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"target_col must be integer-typed for exact sums, got {dt!r} "
            "— rescale upstream (e.g. money to cents)"
        )
    rows = df.filter(t.isNotNull())
    per_cat = rows.groupBy(cat_col).agg(
        F.count(F.lit(1)).alias("n"), F.sum(target_col).alias("sum")
    )
    glob = rows.agg(
        (
            F.sum(target_col).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("__mu__")
    )
    w = F.lit(float(prior_weight))
    if not loo:
        return per_cat.crossJoin(F.broadcast(glob)).select(
            cat_col,
            "n",
            "sum",
            (
                (F.col("sum").cast("double") + w * F.col("__mu__"))
                / (F.col("n").cast("double") + w)
            ).alias(out_col),
        )
    # null-safe equi-join: NULL categories are a real group and a plain
    # equi-join would silently drop them from the encoding
    pc = per_cat.withColumnRenamed(cat_col, "__cat__")
    joined = rows.join(
        pc, F.col(cat_col).eqNullSafe(F.col("__cat__")), "left"
    )
    return joined.crossJoin(F.broadcast(glob)).select(
        *[F.col(c) for c in df.columns],
        (
            (
                (F.col("sum") - t).cast("double") + w * F.col("__mu__")
            )
            / ((F.col("n") - F.lit(1)).cast("double") + w)
        ).alias(out_col),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival estimate with right-censoring — the
    retention/churn curve: at each event time t with d_t observed events
    among n_t at-risk subjects, S(t) = Π_{u ≤ t} (1 − d_u/n_u); censored
    subjects (``event_col`` = 0) leave the risk set without an event.

    Contract: ``duration_col`` must be integer-typed (bucket continuous
    durations upstream — days, not timestamps) and the number of
    DISTINCT durations bounded (calendar-bounded by construction): the
    curve relation is tiny, so the cumulative machinery runs windows
    over per-duration counts, never over subjects. Subjects aggregate
    in ONE partial-combined pass; n_risk is total − exclusive running
    count; survival is the time-ordered product of exact
    (1 − d/n) factors folded left-to-right — a scalar double fold, so
    the whole curve is bit-identical cross-engine (the ewma contract;
    no exp(Σln) shortcut, which would drag libm in).

    NULL durations/events are dropped. Output: one row per duration
    with ≥1 observed event — (t, n_risk, n_events, survival).
    """
    dt = dict(df.dtypes).get(duration_col)
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"duration_col must be integer-typed, got {dt!r} — bucket "
            "continuous durations upstream"
        )
    rows = df.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    )
    per_t = rows.groupBy(F.col(duration_col).alias("t")).agg(
        F.count(F.lit(1)).alias("__c__"),
        F.sum(
            F.when(F.col(event_col).cast("int") != 0, 1).otherwise(0)
        ).alias("n_events"),
    )
    # per_t is the |distinct durations|-bounded curve relation and both
    # the total and the windows derive from it — localCheckpoint it so
    # Catalyst doesn't inline the subject scan twice (the t_closeness
    # lesson: the broadcast-total branch re-derives the whole subtree).
    per_t = per_t.localCheckpoint(eager=True)
    total = per_t.agg(F.sum("__c__").alias("__total__"))
    w_before = (
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    curve = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("__total__")
            - F.coalesce(F.sum("__c__").over(w_before), F.lit(0)),
        )
        .withColumn(
            "__f__",
            F.lit(1.0)
            - F.col("n_events").cast("double") / F.col("n_risk").cast("double"),
        )
    )
    w_upto = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    curve = curve.withColumn(
        "survival",
        F.aggregate(
            F.collect_list("__f__").over(w_upto),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ),
    )
    return curve.filter(F.col("n_events") > 0).select(
        "t", "n_risk", "n_events", "survival"
    )


def mann_whitney_u(
    df: DataFrame,
    group_cols: Sequence[str],
    arm_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group Mann–Whitney U (Wilcoxon rank-sum) — the NONPARAMETRIC
    A/B test beside ``welch_ab_test``: U_A counts how often an A value
    beats a B value (ties count half), with the normal-approximation z
    under the tie-corrected variance. Robust to the heavy-tailed metric
    distributions where Welch's t is the wrong tool.

    No global ranking pass: U is pure rank ALGEBRA over per-(group,
    value) counts — 2·U_A = Σ_v cA(v)·(2·cumB(<v) + cB(v)), an exact
    int64 — so the only window runs over the per-group DISTINCT-value
    relation (``value_col`` must be integer-typed; bucket continuous
    metrics upstream, which also gives ties real meaning). μ, the
    tie-corrected σ and z are a fixed chain of exact-rounded double ops
    over exact integers — bit-identical cross-engine (keep Σ(t³−t)
    < 2^53 — bucket coarser otherwise). Arms must be 0/1 in
    ``arm_col``; NULL arms/values are dropped; groups with an empty arm
    or zero variance emit NULL z.

    Output: (*group_cols, n_a, n_b, u_a, u_b, z).
    """
    if not group_cols:
        raise ValueError("mann_whitney_u needs at least one group column")
    types = dict(df.dtypes)
    if types.get(value_col) not in _INT_TYPES:
        raise ValueError(
            f"value_col must be integer-typed, got "
            f"{types.get(value_col)!r} — bucket continuous metrics upstream"
        )
    rows = df.filter(
        F.col(arm_col).isin(0, 1) & F.col(value_col).isNotNull()
    )
    per_v = rows.groupBy(*group_cols, F.col(value_col).alias("__v__")).agg(
        F.sum(F.when(F.col(arm_col) == 0, 1).otherwise(0)).alias("__ca__"),
        F.sum(F.when(F.col(arm_col) == 1, 1).otherwise(0)).alias("__cb__"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_v = per_v.withColumn(
        "__cumb__", F.coalesce(F.sum("__cb__").over(w), F.lit(0))
    )
    t = F.col("__ca__") + F.col("__cb__")
    agg = per_v.groupBy(*group_cols).agg(
        F.sum("__ca__").alias("n_a"),
        F.sum("__cb__").alias("n_b"),
        F.sum(
            F.col("__ca__") * (F.lit(2) * F.col("__cumb__") + F.col("__cb__"))
        ).alias("__u2__"),
        F.sum(t * t * t - t).alias("__ties__"),
    )
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    n = F.col("n_a") + F.col("n_b")
    nd = n.cast("double")
    u_a = F.col("__u2__").cast("double") / F.lit(2.0)
    mu = nad * nbd / F.lit(2.0)
    var = (
        nad
        * nbd
        / F.lit(12.0)
        * (
            (nd + F.lit(1.0))
            - F.col("__ties__").cast("double") / (nd * (nd - F.lit(1.0)))
        )
    )
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0.0),
        (u_a - mu) / F.sqrt(var),
    )
    return agg.select(
        *group_cols,
        "n_a",
        "n_b",
        u_a.alias("u_a"),
        (nad * nbd - u_a).alias("u_b"),
        z.alias("z"),
    )


def backtest_seasonal_naive(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    season_days: int = 7,
) -> DataFrame:
    """BACKTEST of the seasonal-naive forecaster (ŷ_t = y_{t−season}) —
    the baseline every forecasting pipeline must beat, and the
    evaluation harness that says so: per key, daily totals are compared
    against their value ``season_days`` earlier, scoring MAE and bias
    (mean signed error) over every day where both sides exist.

    Exactness contract: ``value_col`` must be integer-typed (cents, not
    dollars — the ``grouped_linreg`` rule); daily totals and error sums
    are then exact int64 and MAE/bias are single exact-rounded divides,
    bit-identical cross-engine. One partial-combined daily aggregate,
    one self-equi-join on (key, day − season) — co-partitioned, no
    window, no per-key state. NULL timestamps/values are dropped.

    Output: (*group_cols, n_days, mae, bias) — keys with no comparable
    day pairs are absent.
    """
    if season_days < 1:
        raise ValueError(f"season_days must be >= 1, got {season_days}")
    if not group_cols:
        raise ValueError("backtest_seasonal_naive needs a group column")
    types = dict(df.dtypes)
    if types.get(value_col) not in _INT_TYPES:
        raise ValueError(
            f"value_col must be integer-typed, got {types.get(value_col)!r} "
            "— rescale upstream (e.g. money to cents)"
        )
    rows = df.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    daily = rows.groupBy(
        *group_cols, F.col(ts_col).cast("date").alias("__d__")
    ).agg(F.sum(value_col).alias("__v__"))
    base = daily.select(
        *group_cols,
        F.date_add(F.col("__d__"), season_days).alias("__d__"),
        F.col("__v__").alias("__pred__"),
    )
    joined = daily.join(base, [*group_cols, "__d__"])
    err = F.col("__v__") - F.col("__pred__")
    agg = joined.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(err)).alias("__sae__"),
        F.sum(err).alias("__se__"),
    )
    return agg.select(
        *group_cols,
        "n_days",
        (F.col("__sae__").cast("double") / F.col("n_days").cast("double")).alias("mae"),
        (F.col("__se__").cast("double") / F.col("n_days").cast("double")).alias("bias"),
    )


def grouped_acf(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    max_lag: int = 5,
) -> DataFrame:
    """Per-group sample autocorrelation function at lags 1..``max_lag`` —
    the time-series diagnostic behind seasonality detection and ARIMA
    order picking:

        acf(k) = Σ_{t}(x_t − x̄)(x_{t+k} − x̄) / Σ_{t}(x_t − x̄)²

    with x̄ and the denominator over the FULL series (the textbook
    estimator). Expanding the numerator removes the mean from every sum:
    Σ x_t·x_{t+k}, Σ x_t, Σ x_{t+k} over the lag-k pairs plus the series'
    (n, Σx, Σx²) — with INTEGER values all six are exact int64 sums
    (order-independent, engine-portable; rescale to cents/millis
    upstream, the ``grouped_corr`` contract) and the closed form is a
    fixed IEEE chain, so acf hash-matches cross-engine. Inputs must be
    integer-typed — fractional columns raise.

    Shuffle profile: ONE window shuffle on the group key computes all
    ``max_lag`` lag columns, then one partial-combined aggregate; lags
    unpivot from a single row per group (no per-lag pass).

    Output: (*group_cols, lag, n, n_pairs, acf) — acf NULL when the
    series is shorter than lag+1 or has zero variance. Value-NULL rows
    are dropped before anything is counted (n matches the summed rows).
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    if not group_cols:
        raise ValueError("grouped_acf needs at least one group column")
    if dict(df.dtypes).get(value_col) not in _INT_TYPES:
        raise ValueError(
            f"grouped_acf needs an integer-typed value column for exact "
            f"sums; got {dict(df.dtypes).get(value_col)!r} — rescale "
            f"upstream (cents, millis) like grouped_corr"
        )
    x = F.col(value_col).cast("bigint")
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    # drop value-NULL rows up front: n, x-bar and the variance denominator
    # must count exactly the rows the sums saw (ADVICE r09)
    lagged = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        x.alias("__x__"),
        *[F.lag(x, k).over(w).alias(f"__l{k}__") for k in range(1, max_lag + 1)],
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("__x__").alias("__s__"),
        F.sum(F.col("__x__") * F.col("__x__")).alias("__q__"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"__l{k}__")
        pair = F.when(lk.isNotNull(), True)
        aggs += [
            F.count(F.when(pair, 1)).alias(f"__np{k}__"),
            F.sum(F.when(pair, lk * F.col("__x__"))).alias(f"__sxy{k}__"),
            F.sum(F.when(pair, lk)).alias(f"__sa{k}__"),
            F.sum(F.when(pair, F.col("__x__"))).alias(f"__sb{k}__"),
        ]
    g = lagged.groupBy(*group_cols).agg(*aggs)

    stack_args = []
    for k in range(1, max_lag + 1):
        stack_args += [
            f"{k}", f"__np{k}__", f"__sxy{k}__", f"__sa{k}__", f"__sb{k}__",
        ]
    unp = g.select(
        *group_cols,
        "n", "__s__", "__q__",
        F.expr(
            f"stack({max_lag}, "
            + ", ".join(stack_args)
            + ") AS (lag, n_pairs, __sxy__, __sa__, __sb__)"
        ),
    )
    nd = F.col("n").cast("double")
    xbar = F.col("__s__").cast("double") / nd
    num = (
        F.col("__sxy__").cast("double")
        - xbar * F.col("__sa__").cast("double")
        - xbar * F.col("__sb__").cast("double")
        + F.col("n_pairs").cast("double") * (xbar * xbar)
    )
    den = F.col("__q__").cast("double") - (
        F.col("__s__").cast("double") * F.col("__s__").cast("double")
    ) / nd
    acf = F.when((F.col("n_pairs") >= 1) & (den > 0.0), num / den)
    return unp.select(
        *group_cols, "lag", "n", "n_pairs", acf.alias("acf")
    )


def changepoint_binary(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Single best mean-shift changepoint per group (one round of binary
    segmentation / CUSUM-style SSE minimization): the split index i that
    minimizes SSE(x_1..x_i) + SSE(x_{i+1}..x_n), i.e. maximizes the
    variance-reduction gain

        gain(i) = S_i²/i + (S_n−S_i)²/(n−i) − S_n²/n.

    Cumulative sums S_i run as exact int64 over the window order (integer
    values required — the ``grouped_corr`` rescale contract), so every
    gain is a fixed IEEE chain on exact ints: bit-replicable
    cross-engine, partitioning-invariant. Tie-break: smallest i.

    Shuffle profile: one window shuffle on the group key (running sum +
    per-group total via unbounded frame), one WindowGroupLimit pick —
    no self-join, no per-group pass.

    Output: (*group_cols, n, cp_idx, gain) — cp_idx is the 1-based last
    index of the left segment (1 ≤ cp_idx < n); groups with n < 2 are
    absent. Value-NULL rows are dropped before indexing.
    """
    if not group_cols:
        raise ValueError("changepoint_binary needs at least one group column")
    if dict(df.dtypes).get(value_col) not in _INT_TYPES:
        raise ValueError(
            f"changepoint_binary needs an integer-typed value column; got "
            f"{dict(df.dtypes).get(value_col)!r} — rescale upstream "
            f"(cents, millis) like grouped_corr"
        )
    x = F.col(value_col).cast("bigint")
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    wall = Window.partitionBy(*group_cols)
    # value-NULL rows would inflate i/n while the running sum skips them
    df = df.filter(F.col(value_col).isNotNull())
    cum = df.select(
        *group_cols,
        F.row_number().over(w).alias("__i__"),
        F.sum(x).over(w).alias("__si__"),
        # True per-group total S_n, NOT max(S_i): with negative values a
        # prefix sum can exceed the final sum, so max of the running sum
        # is the wrong total (ADVICE r09).
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum(x).over(wall).alias("__sn__"),
    )
    i_d = F.col("__i__").cast("double")
    n_d = F.col("n").cast("double")
    si = F.col("__si__").cast("double")
    sn = F.col("__sn__").cast("double")
    r_d = n_d - i_d
    gain = (si * si) / i_d + ((sn - si) * (sn - si)) / r_d - (sn * sn) / n_d
    scored = cum.filter(F.col("__i__") < F.col("n")).select(
        *group_cols, "n", F.col("__i__").alias("cp_idx"), gain.alias("gain")
    )
    pick = Window.partitionBy(*group_cols).orderBy(
        F.col("gain").desc(), F.col("cp_idx").asc()
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(pick))
        .filter(F.col("__rn__") == 1)
        .select(*group_cols, "n", "cp_idx", "gain")
    )


def theil_sen(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    max_n: int = 200,
) -> DataFrame:
    """Per-group Theil–Sen robust slope: the LOWER MEDIAN of all pairwise
    slopes (y_j − y_i)/(x_j − x_i) over x_i < x_j — up to ~29% outlier
    contamination leaves the estimate intact where OLS (``grouped_linreg``)
    is dragged arbitrarily far. Lower median (element ⌈m/2⌉ of the sorted
    slopes) instead of the interpolated median: element SELECTION is
    engine-exact, while midpoint interpolation is one more IEEE op whose
    formula differs across engines — documented deviation.

    Integer x and y required (the ``grouped_corr`` rescale contract):
    each slope is then a single exact-int divide — bit-replicable.

    Pairs are O(n²) per group: the first ``max_n`` rows per group in
    window order (x, then y, then input order) enter the pair join, so a
    group costs at most max_n² slope rows — the documented sampling cap
    (raise it for small groups, pre-aggregate for dense series). The
    self-join is group-key + rank-banded: only in-group pairs ship.

    Output: (*group_cols, n_pairs, slope).
    """
    if not group_cols:
        raise ValueError("theil_sen needs at least one group column")
    if max_n < 2:
        raise ValueError(f"max_n must be >= 2, got {max_n}")
    types = dict(df.dtypes)
    if types.get(x_col) not in _INT_TYPES or types.get(y_col) not in _INT_TYPES:
        raise ValueError(
            "theil_sen needs integer-typed x and y columns; got "
            f"{types.get(x_col)!r}/{types.get(y_col)!r} — rescale upstream "
            "(days, cents, millis) like grouped_corr"
        )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__x__").asc(), F.col("__y__").asc()
    )
    capped = (
        df.select(
            *group_cols,
            F.col(x_col).cast("bigint").alias("__x__"),
            F.col(y_col).cast("bigint").alias("__y__"),
        )
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= max_n)
    )
    # Materialize the capped relation once: the self-join below would
    # otherwise re-scan and re-window the full input for BOTH sides
    # (two parquet scans + two WindowGroupLimit passes — measured).
    capped = capped.localCheckpoint(eager=True)
    a = capped.alias("a")
    b = capped.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in group_cols]
    slopes = (
        a.join(
            b,
            on=on
            + [
                F.col("a.__rn__") < F.col("b.__rn__"),
                F.col("a.__x__") != F.col("b.__x__"),
            ],
        )
        .select(
            *[F.col(f"a.{c}").alias(c) for c in group_cols],
            (
                (F.col("b.__y__") - F.col("a.__y__")).cast("double")
                / (F.col("b.__x__") - F.col("a.__x__")).cast("double")
            ).alias("__slope__"),
        )
    )
    # Lower median by aggregate instead of a sort+double-window pass:
    # element ⌈m/2⌉ of the ascending sort — array_sort uses the same
    # double ordering as the window ORDER BY, and selection at a fixed
    # rank is tie-insensitive, so the value is identical (pairs per
    # group are bounded by max_n², so the list is bounded too).
    return slopes.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.element_at(
            F.array_sort(F.collect_list("__slope__")),
            F.ceil(F.count(F.lit(1)) / 2).cast("int"),
        ).alias("slope"),
    )


def ks_test(
    df: DataFrame,
    group_cols: Sequence[str],
    arm_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group two-sample Kolmogorov–Smirnov statistic — the
    distribution-shape A/B test beside ``mann_whitney_u`` (which only
    sees location): D = max_v |F_A(v) − F_B(v)| over the empirical CDFs.

    Exact by construction: with integer values (the rescale contract)
    the CDF comparison runs CROSS-MULTIPLIED — D_num = max_v
    |cumA(v)·n_B − cumB(v)·n_A| as exact int64 — and D is ONE final
    divide by n_A·n_B, so the statistic hash-matches cross-engine (no
    per-step double CDFs whose rounding could reorder the argmax).

    Same shuffle shape as ``mann_whitney_u``: one partial-combined
    aggregate to per-(group, value) counts, one window over the
    DISTINCT-value relation, one final aggregate. Arms must be 0/1;
    NULL arms/values drop; groups with an empty arm emit NULL d.

    Output: (*group_cols, n_a, n_b, d).
    """
    if not group_cols:
        raise ValueError("ks_test needs at least one group column")
    if dict(df.dtypes).get(value_col) not in _INT_TYPES:
        raise ValueError(
            f"value_col must be integer-typed, got "
            f"{dict(df.dtypes).get(value_col)!r} — bucket continuous "
            "metrics upstream"
        )
    rows = df.filter(
        F.col(arm_col).isin(0, 1) & F.col(value_col).isNotNull()
    )
    per_v = rows.groupBy(*group_cols, F.col(value_col).alias("__v__")).agg(
        F.sum(F.when(F.col(arm_col) == 0, 1).otherwise(0)).alias("__ca__"),
        F.sum(F.when(F.col(arm_col) == 1, 1).otherwise(0)).alias("__cb__"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_v.select(
        *group_cols,
        F.sum("__ca__").over(w).alias("__cuma__"),
        F.sum("__cb__").over(w).alias("__cumb__"),
    )
    wt = Window.partitionBy(*group_cols)
    scored = cum.select(
        *group_cols,
        "__cuma__",
        "__cumb__",
        F.max("__cuma__").over(wt).alias("n_a"),
        F.max("__cumb__").over(wt).alias("n_b"),
    )
    agg = scored.groupBy(*group_cols).agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.max(
            F.abs(
                F.col("__cuma__") * F.col("n_b")
                - F.col("__cumb__") * F.col("n_a")
            )
        ).alias("__dnum__"),
    )
    d = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.col("__dnum__").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
    )
    return agg.select(*group_cols, "n_a", "n_b", d.alias("d"))


def auc_score(
    df: DataFrame,
    group_cols: Sequence[str],
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Per-group ROC AUC of an integer score against a 0/1 label — the
    ranking-model evaluation: AUC = P(score⁺ > score⁻) + ½·P(tie),
    which is exactly U⁺/(n⁺·n⁻) — the Mann–Whitney statistic re-read as
    a classifier metric, computed by the same exact rank ALGEBRA over
    per-(group, value) counts (2·U exact int64, one final divide):
    no global ranking pass, no per-row sort, bit-portable cross-engine.

    Scores must be integer-typed (quantize model outputs upstream —
    1e-6-scale fixed point loses nothing a ranking metric can see).
    Labels outside {0, 1} and NULL scores drop; groups with an empty
    class emit NULL auc.

    Output: (*group_cols, n_pos, n_neg, auc).
    """
    if not group_cols:
        raise ValueError("auc_score needs at least one group column")
    if dict(df.dtypes).get(score_col) not in _INT_TYPES:
        raise ValueError(
            f"score_col must be integer-typed, got "
            f"{dict(df.dtypes).get(score_col)!r} — quantize upstream"
        )
    rows = df.filter(
        F.col(label_col).isin(0, 1) & F.col(score_col).isNotNull()
    )
    per_v = rows.groupBy(*group_cols, F.col(score_col).alias("__v__")).agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("__cp__"),
        F.sum(F.when(F.col(label_col) == 0, 1).otherwise(0)).alias("__cn__"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_v = per_v.withColumn(
        "__cumn__", F.coalesce(F.sum("__cn__").over(w), F.lit(0))
    )
    agg = per_v.groupBy(*group_cols).agg(
        F.sum("__cp__").alias("n_pos"),
        F.sum("__cn__").alias("n_neg"),
        F.sum(
            F.col("__cp__") * (F.lit(2) * F.col("__cumn__") + F.col("__cn__"))
        ).alias("__u2__"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.col("__u2__").cast("double")
        / (
            F.lit(2.0)
            * F.col("n_pos").cast("double")
            * F.col("n_neg").cast("double")
        ),
    )
    return agg.select(*group_cols, "n_pos", "n_neg", auc.alias("auc"))


def pr_curve(
    df: DataFrame,
    group_cols: Sequence[str],
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Per-group precision/recall curve points at EVERY distinct score
    threshold (predict positive iff score ≥ t) — the classifier-eval
    companion to ``auc_score``: exact confusion counts from one
    descending cumulative pass over per-(group, value) counts, so the
    curve needs no global sort and every precision/recall is one exact
    divide (engine-portable).

    Integer scores required (quantize upstream — the ``auc_score``
    contract); labels outside {0,1} and NULL scores drop.

    Output: (*group_cols, threshold, tp, fp, fn, tn, precision, recall)
    — one row per distinct score value, descending-threshold semantics.
    """
    if not group_cols:
        raise ValueError("pr_curve needs at least one group column")
    if dict(df.dtypes).get(score_col) not in _INT_TYPES:
        raise ValueError(
            f"score_col must be integer-typed, got "
            f"{dict(df.dtypes).get(score_col)!r} — quantize upstream"
        )
    rows = df.filter(
        F.col(label_col).isin(0, 1) & F.col(score_col).isNotNull()
    )
    per_v = rows.groupBy(*group_cols, F.col(score_col).alias("threshold")).agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("__p__"),
        F.sum(F.when(F.col(label_col) == 0, 1).otherwise(0)).alias("__n__"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("threshold").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*group_cols)
    cum = per_v.select(
        *group_cols,
        "threshold",
        F.sum("__p__").over(w).alias("tp"),
        F.sum("__n__").over(w).alias("fp"),
        F.sum("__p__").over(wt).alias("__tot_p__"),
        F.sum("__n__").over(wt).alias("__tot_n__"),
    )
    return cum.select(
        *group_cols,
        "threshold",
        "tp",
        "fp",
        (F.col("__tot_p__") - F.col("tp")).alias("fn"),
        (F.col("__tot_n__") - F.col("fp")).alias("tn"),
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("precision"),
        F.when(
            F.col("__tot_p__") > 0,
            F.col("tp").cast("double") / F.col("__tot_p__").cast("double"),
        ).alias("recall"),
    )


def calibration_bins(
    df: DataFrame,
    group_cols: Sequence[str],
    label_col: str,
    score_col: str,
    bin_width: int,
) -> DataFrame:
    """Per-group reliability-diagram bins: bucket integer scores into
    equi-width bins and report the OBSERVED positive rate per bin
    against the bin's mean score — 'does a 0.8 score mean 80%?' as one
    partial-combined aggregate of exact counts/sums; both emitted rates
    are single exact divides (engine-portable). The drill-down behind an
    AUC: a model can rank perfectly and still be badly calibrated.

    Output: (*group_cols, bin, n, n_pos, pos_rate, mean_score).
    """
    if not group_cols:
        raise ValueError("calibration_bins needs at least one group column")
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    if dict(df.dtypes).get(score_col) not in _INT_TYPES:
        raise ValueError(
            f"score_col must be integer-typed, got "
            f"{dict(df.dtypes).get(score_col)!r} — quantize upstream"
        )
    rows = df.filter(
        F.col(label_col).isin(0, 1) & F.col(score_col).isNotNull()
    )
    agg = rows.groupBy(
        *group_cols,
        F.floor(F.col(score_col) / bin_width).cast("bigint").alias("bin"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.col(score_col).cast("bigint")).alias("__ssum__"),
    )
    return agg.select(
        *group_cols,
        "bin",
        "n",
        "n_pos",
        (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
            "pos_rate"
        ),
        (F.col("__ssum__").cast("double") / F.col("n").cast("double")).alias(
            "mean_score"
        ),
    )


# Inverse-CDF thresholds for Poisson(1) at 2^31 scale: a 31-bit uniform
# hash h maps to weight k = #(thresholds < h)-style CASE ladder. Pure
# integer comparisons — no libm, engine-exact (floor(CDF_k * 2^31),
# k = 0..7; h >= T_7 clamps to 8, cumulative mass ~1 - 1e-5).
_POISSON1_T = [
    790015084,
    1580030168,
    1975037710,
    2106706891,
    2139624186,
    2146207645,
    2147304888,
    2147461638,
]


def _poisson1_weight(h) -> F.Column:
    """Map a 31-bit uniform column to a Poisson(1) draw via the integer
    threshold ladder above."""
    w = F.lit(8)
    for k in range(len(_POISSON1_T) - 1, -1, -1):
        w = F.when(h < F.lit(_POISSON1_T[k]), F.lit(k)).otherwise(w)
    return w.cast("int")


def poisson_bootstrap_ci(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    replicates: int = 40,
    lo_rank: int = 2,
    hi_rank: int = 39,
) -> DataFrame:
    """Bootstrap confidence interval for the per-group mean in ONE pass —
    the Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012; Kleiner et al.'s BLB is the
    heavier cousin): instead of resampling the data B times (B full
    shuffles — unrunnable at 100 TB), each ROW draws an independent
    Poisson(1) replication weight per replicate, and replicate b's mean
    is Σ(w_b·x)/Σ(w_b). One explode(×B) feeding one partial-combined
    aggregate: the shuffle carries |groups|·B aggregate states, never a
    second copy of the data.

    Determinism contract: the per-(row, replicate) weight comes from the
    portable 31-bit md5 hash of ``id:replicate`` pushed through an
    integer inverse-CDF ladder (no RNG, no libm) — every weight, hence
    every replicate sum, is engine-exact, and the replicate mean is one
    IEEE double division of two exact BIGINTs. The CI bounds are the
    ``lo_rank``-th / ``hi_rank``-th smallest replicate means (defaults =
    the 5th/97.5th percentile ranks of 40 replicates), rank ties broken
    by replicate id — fully value-oracleable.

    ``value_col`` must be integer-typed (cents/micros — exact replicate
    sums); empty replicates (all weights 0 — vanishingly rare beyond toy
    groups) are excluded from the rank order.

    Output: group_cols + (n BIGINT, point_mean, ci_lo, ci_hi DOUBLE).
    """
    if dict(df.dtypes).get(value_col) not in _INT_TYPES:
        raise ValueError(
            f"poisson_bootstrap_ci needs an integer value column, got "
            f"{dict(df.dtypes).get(value_col)!r} — rescale to cents/micros"
        )
    if not (1 <= lo_rank < hi_rank <= replicates):
        raise ValueError(
            f"need 1 <= lo_rank < hi_rank <= replicates, got "
            f"({lo_rank}, {hi_rank}, {replicates})"
        )
    from pangool_spark.operators.dedup import base_hash_31

    gcols = list(group_cols)
    rows = df.filter(F.col(value_col).isNotNull())
    sid = F.col(id_col).cast("string")
    v = F.col(value_col).cast("bigint")
    # NOTE (r11): a one-scan wide-aggregate form (80 sum expressions +
    # array_sort rank selection, no explode/window/join) was measured
    # 2x SLOWER here — 40 md5 ladders in one expression tree defeat
    # whole-stage codegen, while this explode form evaluates one small
    # codegen'd md5 per exploded row. Kept deliberately.
    rep = rows.select(
        *gcols,
        v.alias("__v__"),
        sid.alias("__id__"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(replicates) - 1))
        ).alias("__rep__"),
    )
    h = base_hash_31(F.concat_ws(":", F.col("__id__"), F.col("__rep__")))
    w = _poisson1_weight(h)
    per_rep = (
        rep.withColumn("__w__", w)
        .groupBy(*gcols, "__rep__")
        .agg(
            F.sum(F.col("__w__").cast("bigint") * F.col("__v__")).alias("__s__"),
            F.sum(F.col("__w__").cast("bigint")).alias("__n__"),
        )
        .filter(F.col("__n__") > 0)
        .withColumn(
            "__mean__",
            F.col("__s__").cast("double") / F.col("__n__").cast("double"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy(*gcols).orderBy("__mean__", "__rep__")
    )
    ranked = per_rep.withColumn("__rk__", rk)
    point = rows.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col(value_col).cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("point_mean"),
    )
    bounds = ranked.groupBy(*gcols).agg(
        F.max(F.when(F.col("__rk__") == lo_rank, F.col("__mean__"))).alias(
            "ci_lo"
        ),
        F.max(F.when(F.col("__rk__") == hi_rank, F.col("__mean__"))).alias(
            "ci_hi"
        ),
    )
    return point.join(bounds, gcols, "inner").select(
        *gcols, "n", "point_mean", "ci_lo", "ci_hi"
    )


def chi_squared_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    quant: int = 1_000_000,
) -> DataFrame:
    """Chi-squared test of independence between two categorical columns
    (is market segment independent of nation? is label distribution
    independent of source shard?) plus Cramer's V effect size — the
    categorical sibling of ``ks_test`` in the classifier/data-QA family.

    One contingency aggregate (|A|x|B| cells — partial-combined), two
    tiny marginal aggregates derived FROM the cell relation (never a
    second data pass), broadcast-joined back. Zero-count cells never
    materialize in a groupBy, but they still contribute E each to chi2
    — handled algebraically: sum over ALL cells of E is N, so
    chi2 = sum_observed[(O-E)^2/E - E] + N (no dense cell cross join
    needed). The per-cell doubles sum in an order Spark does not fix —
    so each observed cell's (contrib - E) is quantized to 1/quant units
    (a deterministic double -> one round) and the TOTAL accumulates as
    an exact BIGINT plus the exact N*quant: order-independent,
    engine-exact, the module's standard decimal-sum trick. Cramer's V
    applies one sqrt (IEEE correctly-rounded — bit-replicable, unlike
    ln/exp).

    NULL categories are kept as their own class (NULL-keyed groupBy row),
    matching SQL GROUP BY semantics on both engines.

    Output: one row — (n BIGINT, n_a BIGINT, n_b BIGINT, dof BIGINT,
    chi2 DOUBLE, cramers_v DOUBLE).
    """
    cells = df.groupBy(
        F.col(col_a).alias("__a__"), F.col(col_b).alias("__b__")
    ).agg(F.count(F.lit(1)).alias("__o__"))
    row_m = cells.groupBy("__a__").agg(F.sum("__o__").alias("__ra__"))
    col_m = cells.groupBy("__b__").agg(F.sum("__o__").alias("__cb__"))
    tot = cells.agg(
        F.sum("__o__").alias("__n__"),
        F.count(F.lit(1)).alias("__cells__"),
    )
    joined = (
        cells.join(F.broadcast(row_m), "__a__")
        .join(F.broadcast(col_m), "__b__")
        .crossJoin(F.broadcast(tot))
    )
    expected = (
        F.col("__ra__").cast("double")
        * F.col("__cb__").cast("double")
        / F.col("__n__").cast("double")
    )
    contrib = (
        (F.col("__o__").cast("double") - expected)
        * (F.col("__o__").cast("double") - expected)
        / expected
    )
    q = F.round((contrib - expected) * F.lit(float(quant))).cast("bigint")
    # class counts from the marginal relations (COUNT(*) keeps a NULL
    # class; COUNT(DISTINCT col) would drop it)
    agg = (
        joined.agg(
            F.max("__n__").alias("n"),
            F.sum(q).alias("__chi2q__"),
        )
        .crossJoin(F.broadcast(row_m.agg(F.count(F.lit(1)).alias("n_a"))))
        .crossJoin(F.broadcast(col_m.agg(F.count(F.lit(1)).alias("n_b"))))
    )
    chi2 = (
        F.col("__chi2q__") + F.col("n") * F.lit(int(quant))
    ).cast("double") / F.lit(float(quant))
    dof = (F.col("n_a") - 1) * (F.col("n_b") - 1)
    min_dim = F.least(F.col("n_a") - 1, F.col("n_b") - 1)
    v = F.sqrt(
        chi2 / (F.col("n").cast("double") * min_dim.cast("double"))
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        dof.cast("bigint").alias("dof"),
        chi2.alias("chi2"),
        v.alias("cramers_v"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two categorical
    labelings of the same rows (two annotators, a heuristic labeler vs a
    gold set, yesterday's classifier vs today's). The label-QA statistic
    every training-data pipeline needs before trusting agreement rates:
    raw accuracy rewards skewed label priors; kappa subtracts the
    chance-agreement floor.

    Everything reduces to exact integers in one contingency pass:
    observed agreement is the diagonal count, chance agreement is
    sum_k(rowN_k * colN_k) — an exact BIGINT dot product of the
    marginals (order-independent) — and kappa is a fixed IEEE double
    expression over the three ints: po = diag/N, pe = sum/N^2,
    kappa = (po - pe)/(1 - pe). Bit-replicable cross-engine; NULL labels
    are their own class. Degenerate pe = 1 (both raters constant and
    equal) emits NULL kappa.

    Output: one row — (n BIGINT, n_agree BIGINT, po DOUBLE, pe DOUBLE,
    kappa DOUBLE).
    """
    cells = df.groupBy(
        F.col(rater_a_col).alias("__a__"), F.col(rater_b_col).alias("__b__")
    ).agg(F.count(F.lit(1)).alias("__o__"))
    row_m = cells.groupBy("__a__").agg(F.sum("__o__").alias("__ra__"))
    col_m = cells.groupBy("__b__").agg(F.sum("__o__").alias("__cb__"))
    pe_num = (
        row_m.join(
            col_m, F.col("__a__").eqNullSafe(F.col("__b__")), "inner"
        )
        .agg(F.sum(F.col("__ra__") * F.col("__cb__")).alias("__pe_num__"))
    )
    base = cells.agg(
        F.sum("__o__").alias("n"),
        F.sum(
            F.when(
                F.col("__a__").eqNullSafe(F.col("__b__")), F.col("__o__")
            ).otherwise(F.lit(0))
        ).alias("n_agree"),
    )
    out = base.crossJoin(F.broadcast(pe_num))
    nd = F.col("n").cast("double")
    po = F.col("n_agree").cast("double") / nd
    pe = F.coalesce(F.col("__pe_num__"), F.lit(0)).cast("double") / (nd * nd)
    kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe))
    return out.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_agree").cast("bigint").alias("n_agree"),
        po.alias("po"),
        pe.alias("pe"),
        kappa.alias("kappa"),
    )


def quantile_normalize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_cols: Sequence[str] = (),
    out_col: str = "qnorm",
) -> DataFrame:
    """Rank-based quantile normalization per group: each value maps to
    its mid-rank quantile (2·rank − 1)/(2·n) in (0, 1) — the
    distribution-free feature harmonization step (cross-batch sensor
    alignment, score calibration across heterogeneous sources) that
    makes any two groups' value distributions comparable without
    assuming a parametric form.

    rank is row_number under (value, tiebreaks) — a total order, so the
    output is deterministic and engine-replicable: one integer window
    rank, one per-group count (same partitioning, exchange reused), one
    fixed IEEE division. ONE shuffle end to end (plan-gated).

    Output: input columns + ``out_col`` DOUBLE.
    """
    keys = list(group_cols)
    ties = list(tiebreak_cols)
    w = Window.partitionBy(*keys).orderBy(value_col, *ties)
    wn = Window.partitionBy(*keys)
    rank = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    qn = (F.lit(2) * rank - F.lit(1)).cast("double") / (
        F.lit(2) * n
    ).cast("double")
    return df.withColumn(out_col, qn)


def weighted_median(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Weighted median per group — the 50% point of the weight mass, the
    right 'typical value' when rows carry unequal importance (median
    price weighted by units sold, median latency weighted by request
    volume). The unweighted median answers 'the middle ROW'; this
    answers 'the middle UNIT'.

    Scale shape: rows first COLLAPSE to distinct (group, value) weight
    sums — a partial-combined aggregate that shrinks the window input
    from |rows| to |distinct values| (the decision_stump trick) — then
    one integer window cumsum over the collapsed relation finds the
    smallest value whose running mass reaches half the total
    (2*cumw >= W — pure integer comparison, no doubles, so the cut is
    knife-edge exact and engine-replicable). Without the collapse, a
    low-cardinality group column sends EVERY row through one window
    task per group: measured 127s at the 100x probe vs seconds after.
    Values and weights must be integer-typed (cents/units); NULL-valued
    or NULL/non-positive-weight rows are excluded. ``tiebreak_cols`` is
    accepted for API stability but unused — after the collapse, values
    are distinct within each group, so the order is already total.

    Output: group_cols + (total_weight BIGINT, median BIGINT).
    """
    for c, what in ((value_col, "value"), (weight_col, "weight")):
        if dict(df.dtypes).get(c) not in _INT_TYPES:
            raise ValueError(
                f"weighted_median needs an integer {what} column, got "
                f"{c}: {dict(df.dtypes).get(c)!r} — rescale to cents/units"
            )
    keys = list(group_cols)
    rows = df.filter(
        F.col(value_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
    )
    collapsed = rows.groupBy(
        *keys, F.col(value_col).cast("bigint").alias("__v__")
    ).agg(F.sum(F.col(weight_col).cast("bigint")).alias("__gw__"))
    w_cum = Window.partitionBy(*keys).orderBy("__v__").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy(*keys)
    staged = collapsed.select(
        *keys,
        "__v__",
        F.sum("__gw__").over(w_cum).alias("__cw__"),
        F.sum("__gw__").over(w_all).alias("__w__"),
    )
    return (
        staged.filter(F.lit(2) * F.col("__cw__") >= F.col("__w__"))
        .groupBy(*keys)
        .agg(
            F.max("__w__").alias("total_weight"),
            F.min("__v__").alias("median"),
        )
    )


def grouped_moments(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
) -> DataFrame:
    """Per-group skewness and excess kurtosis from the four raw power
    sums — the distribution-shape profile (is the tail heavy? is the
    spread asymmetric?) as ONE partial-combined aggregate, the
    ``grouped_linreg`` pattern extended to third and fourth moments.

    ``x_col`` must be integer-typed (cents/units — the module's exact
    path): Σx..Σx⁴ accumulate as decimal(38,0)/HUGEINT-exact integers,
    so they are order-independent and engine-identical. The central-
    moment solve is a fixed sequence of IEEE double ops and the only
    libm call is sqrt (correctly rounded) — but a power sum above 2⁵³
    hits the engines' integer→double conversion, which is NOT uniformly
    correctly rounded across engines (measured: DuckDB's
    HUGEINT→DOUBLE is 1 ulp off Spark's correctly-rounded
    decimal→double on Σc⁴ ≈ 3.1e19). So the two outputs fed by the
    big sums — skewness (Σx³) and kurtosis (Σx⁴) — are rounded to 9
    decimals, which fully absorbs ulp drift at their O(1..10³)
    scale-free magnitudes. mean/variance_pop are NOT rounded: their
    sums stay exact-in-double while Σx² < 2⁵³ (so they hash-match
    bit-for-bit), and rounding large-magnitude doubles to 9 decimals
    is itself engine-divergent (x·10⁹ > 2⁵³ makes round() lossy and
    implementation-dependent). Keep per-group Σ|x|⁴ under 10³⁸ (≈
    |x| ≤ 10⁷ at 10¹⁰ rows per group) — beyond that the exact sum
    itself overflows; rescale the measure.

    Population moments (n denominator)::

        mu = Σx/n
        m2 = Σx²/n − mu²                       (variance_pop)
        m3 = Σx³/n − 3·mu·(Σx²/n) + 2·mu³
        m4 = Σx⁴/n − 4·mu·(Σx³/n) + 6·mu²·(Σx²/n) − 3·mu⁴
        skewness = m3 / (m2·√m2),  kurtosis_excess = m4/m2² − 3

    NULL x rows are excluded. Groups with n < 2 or zero variance emit
    NULL skewness/kurtosis (shape of a point mass is undefined).

    Output: (*group_cols, n, mean, variance_pop, skewness,
    kurtosis_excess).
    """
    if not group_cols:
        raise ValueError("grouped_moments needs at least one group column")
    if dict(df.dtypes).get(x_col) not in _INT_TYPES:
        raise ValueError(
            f"grouped_moments needs an integer x column, got "
            f"{x_col}: {dict(df.dtypes).get(x_col)!r} — rescale to "
            "cents/units"
        )
    x = F.col(x_col).cast("decimal(38,0)")
    agg = (
        df.filter(F.col(x_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).cast("double").alias("__s1__"),
            F.sum(x * x).cast("double").alias("__s2__"),
            F.sum(x * x * x).cast("double").alias("__s3__"),
            F.sum(x * x * x * x).cast("double").alias("__s4__"),
        )
    )
    n = F.col("n").cast("double")
    mu = F.col("__s1__") / n
    m2 = F.col("__s2__") / n - mu * mu
    m3 = (
        F.col("__s3__") / n
        - F.lit(3.0) * mu * (F.col("__s2__") / n)
        + F.lit(2.0) * mu * mu * mu
    )
    m4 = (
        F.col("__s4__") / n
        - F.lit(4.0) * mu * (F.col("__s3__") / n)
        + F.lit(6.0) * mu * mu * (F.col("__s2__") / n)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    ok = (F.col("n") >= 2) & (m2 > 0.0)
    return agg.select(
        *group_cols,
        "n",
        mu.alias("mean"),
        m2.alias("variance_pop"),
        F.when(ok, F.round(m3 / (m2 * F.sqrt(m2)), 9)).alias("skewness"),
        F.when(ok, F.round(m4 / (m2 * m2) - F.lit(3.0), 9)).alias(
            "kurtosis_excess"
        ),
    )


def cuped(
    df: DataFrame,
    arm_col: str,
    metric_col: str,
    covariate_col: str,
) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013):
    adjust the experiment metric by a pre-period covariate,
    ``y_adj = ȳ_arm − θ·(x̄_arm − x̄)`` with the pooled
    ``θ = cov(x, y)/var(x)`` — the industry-standard way to shrink A/B
    confidence intervals without more traffic. Rows are experiment
    units (already unit-aggregated); NULL metric/covariate rows are
    excluded pairwise; units with no pre-period activity should carry
    covariate 0, not NULL (that IS their pre-period signal).

    Both columns must be integer-typed (cents/units): θ, the adjusted
    means, and the variance-reduction ratio ρ² = cov²/(var_x·var_y)
    all derive from five exact int64 sums per arm (ONE partial-combined
    aggregate; the pooled sums are the arm sums re-added), so every
    output is a fixed IEEE expression over exact integers —
    engine-replicable with no libm at all. Keep per-arm Σx², Σxy, Σy²
    under 2⁵³ for bit-exact cross-engine hashes (the
    ``grouped_linreg`` contract; rescale to coarser units beyond).

    Output (one row per arm): ``(arm_col, n, y_mean, x_mean, y_adj,
    theta, rho2)`` — theta/rho2 are pooled, repeated per row so the
    relation is self-contained; NULL when the pooled covariate variance
    is 0 (nothing to adjust with).
    """
    types = dict(df.dtypes)
    for c, what in ((metric_col, "metric"), (covariate_col, "covariate")):
        if types.get(c) not in _INT_TYPES:
            raise ValueError(
                f"cuped needs an integer {what} column, got {c}: "
                f"{types.get(c)!r} — rescale to cents/units"
            )
    x = F.col(covariate_col).cast("bigint")
    y = F.col(metric_col).cast("bigint")
    both = x.isNotNull() & y.isNotNull()
    arms = df.filter(both).groupBy(arm_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx__"),
        F.sum(y).alias("__sy__"),
        F.sum(x * y).alias("__sxy__"),
        F.sum(x * x).alias("__sxx__"),
        F.sum(y * y).alias("__syy__"),
    )
    w = Window.partitionBy()  # |arms| rows
    gn = F.sum("n").over(w).cast("double")
    gsx = F.sum("__sx__").over(w).cast("double")
    gsy = F.sum("__sy__").over(w).cast("double")
    gsxy = F.sum("__sxy__").over(w).cast("double")
    gsxx = F.sum("__sxx__").over(w).cast("double")
    gsyy = F.sum("__syy__").over(w).cast("double")
    gxbar = gsx / gn
    gybar = gsy / gn
    cov = gsxy / gn - gxbar * gybar
    var_x = gsxx / gn - gxbar * gxbar
    var_y = gsyy / gn - gybar * gybar
    theta = F.when(var_x > 0.0, cov / var_x)
    rho2 = F.when(
        (var_x > 0.0) & (var_y > 0.0), (cov * cov) / (var_x * var_y)
    )
    n = F.col("n").cast("double")
    ybar = F.col("__sy__").cast("double") / n
    xbar = F.col("__sx__").cast("double") / n
    return arms.select(
        arm_col,
        "n",
        ybar.alias("y_mean"),
        xbar.alias("x_mean"),
        F.when(
            theta.isNotNull(), ybar - theta * (xbar - gxbar)
        ).alias("y_adj"),
        theta.alias("theta"),
        rho2.alias("rho2"),
    )


def raking_weights(
    df: DataFrame,
    a_col: str,
    b_col: str,
    row_targets: "dict",
    col_targets: "dict",
    iters: int = 3,
    quantum: int = 1_000_000,
) -> DataFrame:
    """Survey raking / iterative proportional fitting: per-cell weights
    that pull the (A × B) contingency margins toward target totals by
    alternating row/column ratio updates (Deming & Stephan 1940) — the
    post-stratification step that makes a skewed sample representative
    before any downstream aggregate.

    Determinism contract for an ITERATIVE float algorithm: weights live
    as QUANTIZED integers between iterations (``round(w · quantum)``),
    so each margin is an exact integer sum (window over the cell
    relation — |A|·|B| rows, never the data) and each update is one
    fixed IEEE expression ``round(wq · (target / (margin / quantum)))``
    — bit-replicable in any engine for a FIXED iteration count, the
    same unrolling contract as pagerank/kcore. Keep ``margin =
    Σ n·wq < 2⁵³`` (≈ 10⁹ rows per margin at quantum 10⁶ and O(1)
    weights) for the exact path; int64 → double is correctly rounded
    in every engine beyond that, but the sum itself must not overflow
    int64.

    Categories absent from a target dict get target 0 (their weights
    collapse toward 0 — stated, not hidden). ``iters`` alternating
    (row, column) passes; after the final pass column margins are
    matched exactly, row margins to IPF convergence.

    Output (|A|·|B| rows): ``(a_col, b_col, n, weight, fitted)`` where
    ``weight = wq/quantum`` and ``fitted = n · weight``.
    """
    if iters <= 0 or iters > 10:
        raise ValueError(f"iters must be in [1, 10], got {iters}")
    if quantum <= 0:
        raise ValueError(f"quantum must be positive, got {quantum}")
    if not row_targets or not col_targets:
        raise ValueError("raking_weights needs non-empty target dicts")

    def _target(col, targets):
        expr = F.lit(0.0)
        for k, v in sorted(targets.items()):
            expr = F.when(F.col(col) == k, F.lit(float(v))).otherwise(expr)
        return expr

    cells = (
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .groupBy(a_col, b_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = F.lit(float(quantum))
    out = cells.withColumn("__wq__", F.lit(int(quantum)).cast("bigint"))
    wa = Window.partitionBy(a_col)
    wb = Window.partitionBy(b_col)
    ta = _target(a_col, row_targets)
    tb = _target(b_col, col_targets)
    for _ in range(int(iters)):
        for win, tgt in ((wa, ta), (wb, tb)):
            margin = F.sum(F.col("n") * F.col("__wq__")).over(win)
            ratio = tgt / (margin.cast("double") / q)
            out = out.withColumn(
                "__wq__",
                F.when(margin > 0, F.round(F.col("__wq__").cast("double") * ratio))
                .otherwise(F.lit(0.0))
                .cast("bigint"),
            )
    return out.select(
        a_col,
        b_col,
        "n",
        (F.col("__wq__").cast("double") / q).alias("weight"),
        (
            F.col("n").cast("double") * (F.col("__wq__").cast("double") / q)
        ).alias("fitted"),
    )


def diff_in_diff(
    df: DataFrame,
    treated_col: str,
    post_col: str,
    metric_col: str,
) -> DataFrame:
    """Difference-in-differences (the Card & Krueger AER'94 design):
    the causal-effect workhorse when you have a treated and a control
    population observed before and after a change —
    ``DiD = (ȳ_treated,post − ȳ_treated,pre) − (ȳ_control,post −
    ȳ_control,pre)``, the treated group's change net of the secular
    trend the control group shows.

    ``treated_col``/``post_col`` are booleans; ``metric_col`` must be
    integer-typed (cents/units — the cuped contract). ONE
    partial-combined aggregate builds the four (treated, post) cells as
    exact int64 sums; the cell means, per-group deltas, and the DiD
    estimate are fixed IEEE expressions over those exact sums (repeated
    per cell row via a |4|-row window, so the relation is
    self-contained) — engine-replicable, zero libm. NULL metric,
    treated, or post rows are excluded (a row that can't be assigned to
    a cell can't enter the contrast).

    Output: the 4 cell rows — (treated, post, n, mean, did) — did is
    NULL when any cell is empty (the contrast is undefined).
    """
    types = dict(df.dtypes)
    if types.get(metric_col) not in _INT_TYPES:
        raise ValueError(
            f"diff_in_diff needs an integer metric column, got "
            f"{metric_col}: {types.get(metric_col)!r} — rescale to cents"
        )
    tr, po = F.col(treated_col), F.col(post_col)
    y = F.col(metric_col).cast("bigint")
    cells = (
        df.filter(tr.isNotNull() & po.isNotNull() & y.isNotNull())
        .groupBy(tr.alias("treated"), po.alias("post"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(y).alias("__sy__"))
    )
    w = Window.partitionBy()  # 4 rows
    mean_of = lambda t, p: F.max(  # noqa: E731
        F.when(
            (F.col("treated") == t) & (F.col("post") == p),
            F.col("__sy__").cast("double") / F.col("n").cast("double"),
        )
    ).over(w)
    m11, m10 = mean_of(True, True), mean_of(True, False)
    m01, m00 = mean_of(False, True), mean_of(False, False)
    return cells.select(
        "treated",
        "post",
        "n",
        (F.col("__sy__").cast("double") / F.col("n").cast("double")).alias(
            "mean"
        ),
        ((m11 - m10) - (m01 - m00)).alias("did"),
    )


def smd_balance(
    df: DataFrame,
    arm_col: str,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Standardized mean difference per covariate between two arms —
    the covariate-balance audit that gates every observational contrast
    (Austin, Statistics in Medicine 2009): ``SMD = (m_t − m_c) /
    sqrt((v_t + v_c)/2)`` with sample variances; |SMD| > 0.1 is the
    conventional imbalance flag.

    ``arm_col`` is boolean (True = treated); ``value_col`` must be
    integer-typed (cents/units — the cuped contract); ``group_col``
    labels the covariate when several are melted into one relation.
    ONE partial-combined aggregate produces six exact int64 sums per
    covariate (n/Σy/Σy² per arm as conditional aggregates — never a
    second pass); mean, variance, and SMD are fixed IEEE chains over
    them (sqrt only), so the relation is engine-replicable bit-for-bit.
    Keep per-arm Σy² under 2⁵³ (the grouped_linreg contract). NULL arm
    or value rows are excluded. SMD is NULL when either arm has n ≤ 1
    or the pooled variance is 0 (no scale to standardize by).

    Output: (group_col, n_t, n_c, mean_t, mean_c, smd).
    """
    types = dict(df.dtypes)
    if types.get(value_col) not in _INT_TYPES:
        raise ValueError(
            f"smd_balance needs an integer value column, got "
            f"{value_col}: {types.get(value_col)!r} — rescale to cents"
        )
    arm = F.col(arm_col)
    y = F.col(value_col).cast("bigint")
    g = (
        df.filter(arm.isNotNull() & y.isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.when(arm, F.lit(1))).alias("n_t"),
            F.count(F.when(~arm, F.lit(1))).alias("n_c"),
            F.coalesce(F.sum(F.when(arm, y)), F.lit(0)).alias("__st__"),
            F.coalesce(F.sum(F.when(~arm, y)), F.lit(0)).alias("__sc__"),
            F.coalesce(F.sum(F.when(arm, y * y)), F.lit(0)).alias("__sst__"),
            F.coalesce(F.sum(F.when(~arm, y * y)), F.lit(0)).alias("__ssc__"),
        )
    )
    n_t, n_c = F.col("n_t").cast("double"), F.col("n_c").cast("double")
    s_t, s_c = F.col("__st__").cast("double"), F.col("__sc__").cast("double")
    ss_t, ss_c = F.col("__sst__").cast("double"), F.col("__ssc__").cast("double")
    # Every division sits under an F.when on its own denominator (the
    # ratio_metric_delta idiom): ANSI throws on double /0 and a flat `&`
    # predicate does NOT short-circuit, so an empty or n=1 arm must make
    # the branch NULL before the division is ever evaluated.
    mean_t = F.when(F.col("n_t") > 0, s_t / n_t)
    mean_c = F.when(F.col("n_c") > 0, s_c / n_c)
    v_t = F.when(
        F.col("n_t") > 1,
        (ss_t - s_t * s_t / n_t) / (F.col("n_t") - F.lit(1)).cast("double"),
    )
    v_c = F.when(
        F.col("n_c") > 1,
        (ss_c - s_c * s_c / n_c) / (F.col("n_c") - F.lit(1)).cast("double"),
    )
    # NULL v_t/v_c (an arm with n ≤ 1) propagates through pooled, so the
    # single `pooled > 0` guard below covers both documented NULL cases.
    pooled = (v_t + v_c) / F.lit(2).cast("double")
    return g.select(
        group_col,
        "n_t",
        "n_c",
        mean_t.alias("mean_t"),
        mean_c.alias("mean_c"),
        F.when(pooled > 0, (mean_t - mean_c) / F.sqrt(pooled)).alias("smd"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimate with right-censoring —
    ``kaplan_meier``'s additive sibling (and the better-behaved curve
    for comparing hazards or feeding Cox-style models):
    ``H(t) = Σ_{u ≤ t} d_u / n_u``.

    Same contract and machinery as ``kaplan_meier`` (integer durations,
    bounded distinct-duration count, one partial-combined subject pass,
    windows only over the per-duration relation). The cumulative sum
    accumulates QUANTIZED per-duration terms (``round(d/n · 1e9)``
    BIGINTs), so the curve is order-independent and hash-stable
    cross-engine — the woe_iv/psi total pattern, here as a running sum.

    NULL durations/events are dropped. Output: one row per duration
    with ≥1 observed event — (t, n_risk, n_events, cum_hazard).
    """
    dt = dict(df.dtypes).get(duration_col)
    if dt not in _INT_TYPES:
        raise ValueError(
            f"duration_col must be integer-typed, got {dt!r} — bucket "
            "continuous durations upstream"
        )
    rows = df.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    )
    per_t = rows.groupBy(F.col(duration_col).alias("t")).agg(
        F.count(F.lit(1)).alias("__c__"),
        F.sum(
            F.when(F.col(event_col).cast("int") != 0, 1).otherwise(0)
        ).alias("n_events"),
    )
    # per_t is the |distinct durations|-bounded curve relation and both
    # the total and the windows derive from it — localCheckpoint it so
    # Catalyst doesn't inline the subject scan twice (the t_closeness
    # lesson: the broadcast-total branch re-derives the whole subtree).
    per_t = per_t.localCheckpoint(eager=True)
    total = per_t.agg(F.sum("__c__").alias("__total__"))
    w_before = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_upto = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("__total__")
            - F.coalesce(F.sum("__c__").over(w_before), F.lit(0)),
        )
        .withColumn(
            "__q__",
            F.round(
                F.col("n_events").cast("double")
                / F.col("n_risk").cast("double")
                * F.lit(1000000000.0)
            ).cast("bigint"),
        )
        .withColumn(
            "cum_hazard",
            F.sum("__q__").over(w_upto).cast("double") / F.lit(1000000000.0),
        )
    )
    return curve.filter(F.col("n_events") > 0).select(
        "t", "n_risk", "n_events", "cum_hazard"
    )


def brier_decomposition(
    df: DataFrame,
    label_col: str,
    score_col: str,
    scale: int = 1000,
    bin_width: int = 100,
) -> DataFrame:
    """Brier score with the Murphy (1973) decomposition — the eval
    triad behind a reliability diagram: ``brier ≈ reliability −
    resolution + uncertainty``. Reliability is miscalibration (0 is
    perfect), resolution is how much the bins separate the base rate
    (bigger is better), uncertainty is the label entropy ``ō(1−ō)`` the
    model can't remove. The identity is exact only when forecasts are
    constant within bins; the within-bin variance it drops is reported
    as ``residual`` so nothing is hidden.

    ``score_col`` is an integer forecast on [0, scale] (quantize
    upstream: 1000 = probability in millis); ``label_col`` must be 0/1.
    One exact-int global aggregate (n, Σy, Σ(score − scale·y)²) + one
    |bins|-sized aggregate; every output is a fixed IEEE chain over
    exact ints, with the cross-bin sums accumulated as QUANTIZED
    integers (the woe_iv/psi pattern) — fully value-oracle-able.
    Rows with NULL/out-of-range scores or non-binary labels are
    excluded. Output: one row — (n, n_bins, brier, reliability,
    resolution, uncertainty, residual).
    """
    if dict(df.dtypes).get(score_col) not in _INT_TYPES:
        raise ValueError(
            f"score_col must be integer-typed, got "
            f"{dict(df.dtypes).get(score_col)!r} — quantize upstream"
        )
    if scale < 1 or bin_width < 1 or bin_width > scale:
        raise ValueError(
            f"need 1 <= bin_width <= scale, got {bin_width}/{scale}"
        )
    s = F.col(score_col).cast("bigint")
    y = F.col(label_col).cast("bigint")
    rows = df.filter(y.isin(0, 1) & s.isNotNull() & (s >= 0) & (s <= scale))
    glob = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("__pos__"),
        F.sum((s - F.lit(scale) * y) * (s - F.lit(scale) * y)).alias("__sse__"),
    )
    bins = rows.groupBy(
        F.floor(s / F.lit(int(bin_width))).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("__nb__"),
        F.sum(y).alias("__posb__"),
        F.sum(s).alias("__sb__"),
    )
    g = bins.crossJoin(F.broadcast(glob))
    nd = F.col("n").cast("double")
    obar = F.col("__pos__").cast("double") / nd
    nbd = F.col("__nb__").cast("double")
    pbar_b = F.col("__sb__").cast("double") / (F.lit(float(scale)) * nbd)
    obar_b = F.col("__posb__").cast("double") / nbd
    share = nbd / nd
    rel_t = (pbar_b - obar_b) * (pbar_b - obar_b) * share
    res_t = (obar_b - obar) * (obar_b - obar) * share
    q = lambda col: F.round(col * F.lit(1000000000.0)).cast("bigint")  # noqa: E731
    out = g.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("n_bins"),
        F.max("__pos__").alias("__pos__"),
        F.max("__sse__").alias("__sse__"),
        (F.sum(q(rel_t)).cast("double") / F.lit(1000000000.0)).alias(
            "reliability"
        ),
        (F.sum(q(res_t)).cast("double") / F.lit(1000000000.0)).alias(
            "resolution"
        ),
    )
    nd2 = F.col("n").cast("double")
    obar2 = F.col("__pos__").cast("double") / nd2
    brier = F.col("__sse__").cast("double") / (
        F.lit(float(scale) * float(scale)) * nd2
    )
    unc = obar2 * (F.lit(1.0) - obar2)
    return out.select(
        "n",
        "n_bins",
        brier.alias("brier"),
        "reliability",
        "resolution",
        unc.alias("uncertainty"),
        (
            brier
            - (F.col("reliability") - F.col("resolution") + unc)
        ).alias("residual"),
    )


def spearman_corr(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation with tie-aware mid-ranks —
    the monotone-association test beside ``grouped_corr``'s Pearson:
    rank both variables (average rank among ties), then Pearson over
    the ranks. Robust to outliers and to any monotone rescaling, which
    is why it is the drift/sanity correlation for heavy-tailed metrics.

    No per-row ranking pass (the ``mann_whitney_u`` design): a row's
    mid-rank depends only on its VALUE, so ranks are computed on the
    per-group DISTINCT-value relations (windows over |values| rows,
    never over subjects) and every Pearson sum is value-cell algebra —
    Σrₓr_y = Σ_cells c·r(x)·r(y) over the (x, y) contingency cells.
    The heavy work is ONE parallel (group, x, y) cell aggregate; a
    per-group row window would instead sort whole groups in single
    tasks (measured 230s at the 100× probe vs 6.9s for this shape).
    Both columns must be integer-typed (bucket continuous metrics
    upstream — which also gives ties real meaning and bounds the cell
    relation); NULL x or y rows are dropped.

    Exactness: mid-ranks are held DOUBLED (``2·cum_before + ties`` —
    an exact int64, never a .5 float; the uniform −1 shift vs the
    textbook 2·avg_rank cancels in rho), and the Pearson sums are exact
    DECIMAL(38,0); rho is one fixed IEEE chain (two sqrts) over those
    exact integers — bit-identical cross-engine. Keep 4·n⁴ < 10³⁸ per
    group (n ≤ ~10⁹ rows). rho is NULL when a group is constant in
    either variable (no rank variance to correlate).

    Output: (*group_cols, n, rho).
    """
    if not group_cols:
        raise ValueError("spearman_corr needs at least one group column")
    types = dict(df.dtypes)
    for c in (x_col, y_col):
        if types.get(c) not in _INT_TYPES:
            raise ValueError(
                f"{c} must be integer-typed, got {types.get(c)!r} — "
                "bucket continuous metrics upstream"
            )
    rows = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    cells = rows.groupBy(
        *group_cols,
        F.col(x_col).alias("__x__"),
        F.col(y_col).alias("__y__"),
    ).agg(F.count(F.lit(1)).alias("__c__"))
    # the bounded cell relation feeds BOTH value-rank branches and the
    # final join — checkpoint it so Catalyst doesn't inline the full
    # corpus aggregate into each branch (3 corpus scans measured at the
    # 100× probe without this; the t_closeness lesson)
    cells = cells.localCheckpoint(eager=True)
    # value-rank tables: windows over the per-group DISTINCT-value
    # relations only (bounded by value cardinality, the MW-U contract)
    def value_ranks(col: str, out: str) -> DataFrame:
        vals = cells.groupBy(*group_cols, col).agg(
            F.sum("__c__").alias("__cv__")
        )
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return vals.select(
            *group_cols,
            col,
            (
                F.lit(2) * F.coalesce(F.sum("__cv__").over(w), F.lit(0))
                + F.col("__cv__")
            ).cast("bigint").alias(out),
        )

    ranked = _join_null_safe(
        _join_null_safe(
            cells, value_ranks("__x__", "__rx__"), [*group_cols, "__x__"]
        ),
        value_ranks("__y__", "__ry__"),
        [*group_cols, "__y__"],
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    cnt = F.col("__c__").cast("decimal(19,0)")
    g = ranked.groupBy(*group_cols).agg(
        F.sum("__c__").alias("n"),
        F.sum((cnt * d19("__rx__")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__sx__"),
        F.sum((cnt * d19("__ry__")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__sy__"),
        F.sum(
            (cnt * (d19("__rx__") * d19("__rx__")).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("__sxx__"),
        F.sum(
            (cnt * (d19("__ry__") * d19("__ry__")).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("__syy__"),
        F.sum(
            (cnt * (d19("__rx__") * d19("__ry__")).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("__sxy__"),
    )
    nn = F.col("n").cast("decimal(19,0)")
    num = (
        (nn * F.col("__sxy__")).cast("decimal(38,0)")
        - (F.col("__sx__") * F.col("__sy__")).cast("decimal(38,0)")
    ).cast("double")
    vx = (
        (nn * F.col("__sxx__")).cast("decimal(38,0)")
        - (F.col("__sx__") * F.col("__sx__")).cast("decimal(38,0)")
    ).cast("double")
    vy = (
        (nn * F.col("__syy__")).cast("decimal(38,0)")
        - (F.col("__sy__") * F.col("__sy__")).cast("decimal(38,0)")
    ).cast("double")
    return g.select(
        *group_cols,
        "n",
        F.when((vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))).alias(
            "rho"
        ),
    )


def logrank_test(
    df: DataFrame,
    arm_col: str,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966) — the hypothesis test that
    completes the ``kaplan_meier``/``nelson_aalen`` survival family: do
    two arms share a survival curve? At each event time t the observed
    arm-1 events d₁ₜ are compared against the hypergeometric expectation
    e₁ₜ = dₜ·n₁ₜ/nₜ given the pooled risk set; the statistic is
    ``chi2 = (Σ(d₁ₜ − e₁ₜ))² / ΣVₜ`` with the hypergeometric variance
    ``Vₜ = dₜ·n₁ₜ·n₀ₜ·(nₜ−dₜ) / (nₜ²·(nₜ−1))``.

    Same machinery contract as ``kaplan_meier``: integer durations with
    a bounded distinct count, ONE partial-combined subject pass into the
    per-duration relation (localCheckpointed — every total and window
    below derives from it), risk sets via reverse cumulative counts.
    Per-duration O−E and V terms are QUANTIZED (×10⁹ bigints) before
    summing — order-independent and hash-stable cross-engine (the
    nelson_aalen convention); each term itself is a fixed IEEE chain
    over exact counts. The chi-square statistic is reported raw (no
    p-value — that would drag the incomplete-gamma into the contract;
    chi2 > 3.84 is the 5% line at 1 df).

    ``arm_col`` must be 0/1; NULL arm/duration/event rows are dropped.
    Output: ONE row — (n_1, n_0, observed_1, expected_1, chi2); chi2 is
    NULL when the variance sum is 0 (degenerate risk sets).
    """
    dt = dict(df.dtypes).get(duration_col)
    if dt not in _INT_TYPES:
        raise ValueError(
            f"duration_col must be integer-typed, got {dt!r} — bucket "
            "continuous durations upstream"
        )
    arm = F.col(arm_col).cast("int")
    rows = df.filter(
        F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
        & arm.isin(0, 1)
    )
    ev = F.col(event_col).cast("int") != 0
    per_t = rows.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.when(arm == 1, 1).otherwise(0)).alias("__c1__"),
        F.sum(F.when(arm == 0, 1).otherwise(0)).alias("__c0__"),
        F.sum(F.when((arm == 1) & ev, 1).otherwise(0)).alias("__d1__"),
        F.sum(F.when((arm == 0) & ev, 1).otherwise(0)).alias("__d0__"),
    )
    # tiny per-duration relation; totals and windows derive from it
    per_t = per_t.localCheckpoint(eager=True)
    totals = per_t.agg(
        F.sum("__c1__").alias("__n1t__"), F.sum("__c0__").alias("__n0t__")
    )
    w_before = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = (
        per_t.crossJoin(F.broadcast(totals))
        .withColumn(
            "__n1__",
            F.col("__n1t__")
            - F.coalesce(F.sum("__c1__").over(w_before), F.lit(0)),
        )
        .withColumn(
            "__n0__",
            F.col("__n0t__")
            - F.coalesce(F.sum("__c0__").over(w_before), F.lit(0)),
        )
        .withColumn("__n__", F.col("__n1__") + F.col("__n0__"))
        .withColumn("__d__", F.col("__d1__") + F.col("__d0__"))
        .filter(F.col("__d__") > 0)
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    e1 = dbl("__d__") * dbl("__n1__") / dbl("__n__")
    v = F.when(
        F.col("__n__") > 1,
        dbl("__d__")
        * dbl("__n1__")
        * dbl("__n0__")
        * (dbl("__n__") - dbl("__d__"))
        / (dbl("__n__") * dbl("__n__") * (dbl("__n__") - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    q = lambda col: F.round(col * F.lit(1000000000.0)).cast(  # noqa: E731
        "bigint"
    )
    terms = at_risk.select(
        F.col("__n1t__"),
        F.col("__n0t__"),
        F.col("__d1__"),
        q(dbl("__d1__") - e1).alias("__qoe__"),
        q(e1).alias("__qe1__"),
        q(v).alias("__qv__"),
    )
    agg = terms.groupBy().agg(
        F.max("__n1t__").alias("n_1"),
        F.max("__n0t__").alias("n_0"),
        F.sum("__d1__").alias("observed_1"),
        F.sum("__qe1__").alias("__sqe__"),
        F.sum("__qoe__").alias("__soe__"),
        F.sum("__qv__").alias("__sv__"),
    )
    oe = F.col("__soe__").cast("double") / F.lit(1000000000.0)
    sv = F.col("__sv__").cast("double") / F.lit(1000000000.0)
    return agg.select(
        "n_1",
        "n_0",
        "observed_1",
        (F.col("__sqe__").cast("double") / F.lit(1000000000.0)).alias(
            "expected_1"
        ),
        F.when(F.col("__sv__") > 0, oe * oe / sv).alias("chi2"),
    )


def ipw_ate(
    df: DataFrame,
    stratum_col: str,
    treated_col: str,
    outcome_col: str,
) -> DataFrame:
    """Stratified inverse-propensity-weighted average treatment effect
    (Horvitz–Thompson 1952 / Rosenbaum–Rubin 1983): within each stratum
    the propensity is the EXACT observed treatment share e_s = n_ts/n_s,
    so the IPW estimator algebraically reduces to the stratified
    difference of means — ``ATE = Σ_s (n_s/N)·(ȳ_ts − ȳ_cs)`` — the
    adjustment that removes confounding carried by the stratum variable
    (the ``cuped``/``diff_in_diff`` family's observational sibling).

    ONE partial-combined aggregate produces exact int64 (n, Σy) per
    (stratum, arm) as conditional sums; per-stratum means/diffs are
    single divides. Each stratum's contribution n_s·(ȳ_ts − ȳ_cs) is
    QUANTIZED (×10⁶ bigint) before the cross-stratum window sum — a raw
    double sum would depend on row order (the nelson_aalen convention).
    Strata with an empty arm carry no counterfactual and are EXCLUDED
    from the estimate (diff/weight NULL, their n missing from N); the
    ATE column is repeated on every row (the diff_in_diff convention).

    ``treated_col`` is boolean; ``outcome_col`` must be integer-typed
    (cents — the cuped contract; keep n_s·|diff|·10⁶ < 2⁶³). NULL
    stratum/treated/outcome rows are dropped.

    Output: (stratum, n_t, n_c, mean_t, mean_c, diff, weight, ate).
    """
    types = dict(df.dtypes)
    if types.get(outcome_col) not in _INT_TYPES:
        raise ValueError(
            f"ipw_ate needs an integer outcome column, got "
            f"{types.get(outcome_col)!r} — rescale to cents"
        )
    if types.get(treated_col) != "boolean":
        raise ValueError(
            f"treated_col must be boolean, got "
            f"{types.get(treated_col)!r} — cast upstream"
        )
    tr = F.col(treated_col)
    y = F.col(outcome_col).cast("bigint")
    g = (
        df.filter(
            F.col(stratum_col).isNotNull() & tr.isNotNull() & y.isNotNull()
        )
        .groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.count(F.when(tr, F.lit(1))).alias("n_t"),
            F.count(F.when(~tr, F.lit(1))).alias("n_c"),
            F.coalesce(F.sum(F.when(tr, y)), F.lit(0)).alias("__st__"),
            F.coalesce(F.sum(F.when(~tr, y)), F.lit(0)).alias("__sc__"),
        )
    )
    usable = (F.col("n_t") > 0) & (F.col("n_c") > 0)
    mean_t = F.col("__st__").cast("double") / F.col("n_t").cast("double")
    mean_c = F.col("__sc__").cast("double") / F.col("n_c").cast("double")
    n_s = F.col("n_t") + F.col("n_c")
    q = F.when(
        usable,
        F.round(n_s.cast("double") * (mean_t - mean_c) * F.lit(1000000.0))
        .cast("bigint"),
    )
    w = Window.partitionBy()  # |strata| rows
    n_used = F.sum(F.when(usable, n_s)).over(w)
    # guard the fold: with NO usable stratum n_used is NULL/0 and ANSI
    # double division would throw rather than yield NULL
    ate = F.when(
        n_used > 0,
        F.sum(q).over(w).cast("double")
        / F.lit(1000000.0)
        / n_used.cast("double"),
    )
    return g.select(
        "stratum",
        "n_t",
        "n_c",
        F.when(F.col("n_t") > 0, mean_t).alias("mean_t"),
        F.when(F.col("n_c") > 0, mean_c).alias("mean_c"),
        F.when(usable, mean_t - mean_c).alias("diff"),
        F.when(usable, n_s.cast("double") / n_used.cast("double")).alias(
            "weight"
        ),
        ate.alias("ate"),
    )


def quantile_treatment_effects(
    df: DataFrame,
    treated_col: str,
    value_col: str,
    probs: "Sequence[float]" = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Quantile treatment effects — the distributional view the mean-
    contrast family (``diff_in_diff``/``ipw_ate``) can't give: at each
    probability p, QTE(p) = Q_treated(p) − Q_control(p), showing WHERE
    in the outcome distribution the treatment moves mass (a treatment
    can leave the mean flat while compressing the tails).

    ONE partial-combined aggregate: both arms' quantile grids come from
    conditional exact ``percentile`` aggregates (value→count map state —
    bounded by the distinct-value count, so quantize/bucket the metric
    upstream; cents of a bounded metric is fine). The linear
    interpolation runs on DOUBLE casts of the integer values and is
    bit-identical to DuckDB's quantile_cont on the same grid (the
    windowed_quantiles precedent). NULL treated/value rows are dropped.
    If EITHER arm is empty the contrast is undefined and the relation is
    EMPTY (documented, not NULL-padded).

    Output: one row per probability — (p, n_t, n_c, q_t, q_c, qte).
    """
    if not probs:
        raise ValueError("quantile_treatment_effects needs probabilities")
    types = dict(df.dtypes)
    if types.get(value_col) not in _INT_TYPES:
        raise ValueError(
            f"value_col must be integer-typed, got "
            f"{types.get(value_col)!r} — quantize upstream"
        )
    if types.get(treated_col) != "boolean":
        raise ValueError(
            f"treated_col must be boolean, got "
            f"{types.get(treated_col)!r} — cast upstream"
        )
    tr = F.col(treated_col)
    y = F.col(value_col).cast("bigint").cast("double")
    parr = F.array(*[F.lit(float(p)) for p in probs])
    agg = df.filter(tr.isNotNull() & F.col(value_col).isNotNull()).agg(
        F.count(F.when(tr, F.lit(1))).alias("n_t"),
        F.count(F.when(~tr, F.lit(1))).alias("n_c"),
        F.percentile(F.when(tr, y), parr).alias("__qt__"),
        F.percentile(F.when(~tr, y), parr).alias("__qc__"),
    )
    ex = agg.select(
        "n_t",
        "n_c",
        F.posexplode(F.arrays_zip(F.col("__qt__"), F.col("__qc__"))).alias(
            "__i__", "__z__"
        ),
    )
    return ex.select(
        F.element_at(parr, F.col("__i__") + 1).alias("p"),
        "n_t",
        "n_c",
        F.col("__z__.__qt__").alias("q_t"),
        F.col("__z__.__qc__").alias("q_c"),
        (F.col("__z__.__qt__") - F.col("__z__.__qc__")).alias("qte"),
    )


def forecast_accuracy(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    season_days: int = 7,
) -> DataFrame:
    """Scaled forecast-accuracy scores for the seasonal-naive forecaster
    — ``backtest_seasonal_naive``'s MAE/bias completed with the three
    scale-free scores the forecasting literature actually compares on:
    MASE (Hyndman–Koehler IJF 2006: seasonal-naive MAE scaled by the
    one-step naive MAE — >1 means the 'model' loses to last-value
    carry-forward), sMAPE, and WAPE.

    Per key, daily totals aggregate once (exact int64 — ``value_col``
    must be integer-typed); the season-lag and 1-lag predictions are two
    co-partitioned self-equi-joins on (key, day−lag). Error sums are
    exact ints; per-day sMAPE ratios are QUANTIZED (×10⁹) before the
    mean (order-independent — the nelson_aalen convention); MASE/WAPE
    are fixed divides over exact sums. Keys with no season-matched day
    are absent; MASE is NULL when the naive scale is 0, WAPE when
    Σ|y| = 0. NULL timestamps/values are dropped.

    Output: (*group_cols, n_days, mase, smape, wape).
    """
    if season_days < 2:
        raise ValueError(
            f"season_days must be >= 2 (1 would make MASE tautologically "
            f"1), got {season_days}"
        )
    if not group_cols:
        raise ValueError("forecast_accuracy needs a group column")
    types = dict(df.dtypes)
    if types.get(value_col) not in _INT_TYPES:
        raise ValueError(
            f"value_col must be integer-typed, got {types.get(value_col)!r} "
            "— rescale upstream (e.g. money to cents)"
        )
    rows = df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
    daily = rows.groupBy(
        *group_cols, F.col(ts_col).cast("date").alias("__d__")
    ).agg(F.sum(F.col(value_col).cast("bigint")).alias("__v__"))
    daily = daily.localCheckpoint(eager=True)

    def lagged(days: int, out: str) -> DataFrame:
        return daily.select(
            *group_cols,
            F.date_add(F.col("__d__"), days).alias("__d__"),
            F.col("__v__").alias(out),
        )

    season = _join_null_safe(
        daily, lagged(season_days, "__ps__"), [*group_cols, "__d__"]
    )
    es = F.col("__v__") - F.col("__ps__")
    smape_day = F.when(
        F.abs(F.col("__v__")) + F.abs(F.col("__ps__")) > 0,
        F.lit(2.0)
        * F.abs(es).cast("double")
        / (F.abs(F.col("__v__")) + F.abs(F.col("__ps__"))).cast("double"),
    ).otherwise(F.lit(0.0))
    s_agg = season.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(es)).alias("__saes__"),
        F.sum(F.abs(F.col("__v__"))).alias("__say__"),
        F.sum(
            F.round(smape_day * F.lit(1000000000.0)).cast("bigint")
        ).alias("__qsm__"),
    )
    one = _join_null_safe(daily, lagged(1, "__p1__"), [*group_cols, "__d__"])
    o_agg = one.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n1__"),
        F.sum(F.abs(F.col("__v__") - F.col("__p1__"))).alias("__sae1__"),
    )
    j = _join_null_safe(s_agg, o_agg, list(group_cols), "left")
    mae_s = F.col("__saes__").cast("double") / F.col("n_days").cast("double")
    mae_1 = F.col("__sae1__").cast("double") / F.col("__n1__").cast("double")
    return j.select(
        *group_cols,
        "n_days",
        F.when(
            F.col("__n1__").isNotNull() & (F.col("__sae1__") > 0),
            mae_s / mae_1,
        ).alias("mase"),
        (
            F.col("__qsm__").cast("double")
            / F.lit(1000000000.0)
            / F.col("n_days").cast("double")
        ).alias("smape"),
        F.when(
            F.col("__say__") > 0,
            F.col("__saes__").cast("double") / F.col("__say__").cast("double"),
        ).alias("wape"),
    )


def cmh_test(
    df: DataFrame,
    stratum_col: str,
    arm_col: str,
    outcome_col: str,
) -> DataFrame:
    """Cochran–Mantel–Haenszel test + Mantel–Haenszel common odds ratio
    — association between a binary arm and a binary outcome CONTROLLING
    for a stratum variable (Mantel & Haenszel, JNCI 1959): the
    categorical sibling of ``ipw_ate`` (which contrasts means) and the
    stratified answer to Simpson's paradox. Per stratum s with 2×2
    cells (a=exposed-positive, b=exposed-negative, c=unexposed-positive,
    d=unexposed-negative, n=a+b+c+d):

        chi2_cmh = (Σ_s (a_s − E_s))² / Σ_s V_s,
        E_s = (a+b)(a+c)/n,  V_s = (a+b)(c+d)(a+c)(b+d) / (n²(n−1)),
        OR_MH = Σ_s(a_s·d_s/n_s) / Σ_s(b_s·c_s/n_s).

    ONE conditional aggregate produces the exact 2×2 int64 cells per
    stratum; the per-stratum E/V/OR terms are fixed IEEE chains over
    exact counts, QUANTIZED (×10⁹) before the cross-stratum sums (the
    nelson_aalen convention — order-independent, hash-stable). The
    statistic is reported raw (chi2 at 1 df; no p-value — the logrank
    contract). Degenerate strata (n ≤ 1) contribute nothing; strata
    with an empty margin contribute V = 0 and their E term still folds
    (the standard treatment). NULL stratum/arm/outcome rows are
    dropped; ``arm_col``/``outcome_col`` must be boolean.

    Output: ONE row — (n_strata, n, exposed_pos, expected_pos, chi2,
    or_mh); chi2 NULL when ΣV = 0, or_mh NULL when the denominator sum
    is 0.
    """
    types = dict(df.dtypes)
    for c in (arm_col, outcome_col):
        if types.get(c) != "boolean":
            raise ValueError(
                f"{c} must be boolean, got {types.get(c)!r} — cast "
                "upstream (0/1 ints do not survive the ~/& algebra)"
            )
    arm, out = F.col(arm_col), F.col(outcome_col)
    rows = df.filter(
        F.col(stratum_col).isNotNull() & arm.isNotNull() & out.isNotNull()
    )
    g = rows.groupBy(F.col(stratum_col).alias("__s__")).agg(
        F.sum(F.when(arm & out, 1).otherwise(0)).alias("__a__"),
        F.sum(F.when(arm & ~out, 1).otherwise(0)).alias("__b__"),
        F.sum(F.when(~arm & out, 1).otherwise(0)).alias("__c__"),
        F.sum(F.when(~arm & ~out, 1).otherwise(0)).alias("__d__"),
    )
    a, b = F.col("__a__"), F.col("__b__")
    c, d = F.col("__c__"), F.col("__d__")
    n = (a + b + c + d).cast("double")
    dbl = lambda col: col.cast("double")  # noqa: E731
    e = (dbl(a + b)) * (dbl(a + c)) / n
    v = F.when(
        a + b + c + d > 1,
        (dbl(a + b)) * (dbl(c + d)) * (dbl(a + c)) * (dbl(b + d))
        / (n * n * (n - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    q = lambda col: F.round(col * F.lit(1000000000.0)).cast(  # noqa: E731
        "bigint"
    )
    terms = g.filter(a + b + c + d > 0).select(
        F.col("__a__"),
        (a + b + c + d).alias("__n__"),
        q(dbl(a) - e).alias("__qoe__"),
        q(e).alias("__qe__"),
        q(v).alias("__qv__"),
        q(dbl(a) * dbl(d) / n).alias("__qad__"),
        q(dbl(b) * dbl(c) / n).alias("__qbc__"),
    )
    agg = terms.groupBy().agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("__n__").alias("n"),
        F.sum("__a__").alias("exposed_pos"),
        F.sum("__qe__").alias("__sqe__"),
        F.sum("__qoe__").alias("__soe__"),
        F.sum("__qv__").alias("__sv__"),
        F.sum("__qad__").alias("__sad__"),
        F.sum("__qbc__").alias("__sbc__"),
    )
    oe = F.col("__soe__").cast("double") / F.lit(1000000000.0)
    sv = F.col("__sv__").cast("double") / F.lit(1000000000.0)
    return agg.select(
        "n_strata",
        "n",
        "exposed_pos",
        (F.col("__sqe__").cast("double") / F.lit(1000000000.0)).alias(
            "expected_pos"
        ),
        F.when(F.col("__sv__") > 0, oe * oe / sv).alias("chi2"),
        F.when(
            F.col("__sbc__") > 0,
            F.col("__sad__").cast("double") / F.col("__sbc__").cast("double"),
        ).alias("or_mh"),
    )


def ratio_metric_delta(
    df: DataFrame,
    group_cols: Sequence[str],
    unit_col: str,
    num_col: str,
    den_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (Deng et al.
    KDD'18's ratio-metric treatment): metrics like revenue-per-event or
    clicks-per-view are ratios of per-UNIT sums, and treating their
    per-row mean as i.i.d. understates the variance because the
    denominator varies per unit. Per group:

        R = Σx/Σy,  Var(R) ≈ (σ²_x − 2R·σ_xy + R²·σ²_y) / (n·ȳ²),

    with per-unit totals (x_u, y_u), sample (co)variances over units,
    and the CI R ± z·√Var.

    Two partial-combined aggregates: per (group, unit) exact int64
    sums, then per group the five exact power sums (n, Σx, Σy, Σx²,
    Σy², Σxy) as DECIMAL(38,0) — the whole CI is a fixed IEEE chain
    (one sqrt) over exact integers. Both metric columns must be
    integer-typed (cents/counts); keep per-group Σx·Σy and the power
    sums under 10³⁸. NULL unit rows are dropped; NULL metric values
    count as 0 for their unit (a unit with no numerator events still
    has denominator exposure). Groups with n ≤ 1 units or Σy = 0 or
    zero denominator mean emit NULL se/CI.

    Output: (*group_cols, n_units, ratio, se, ci_lo, ci_hi).
    """
    if not group_cols:
        raise ValueError("ratio_metric_delta needs a group column")
    types = dict(df.dtypes)
    for c in (num_col, den_col):
        if types.get(c) not in _INT_TYPES:
            raise ValueError(
                f"{c} must be integer-typed, got {types.get(c)!r} — "
                "rescale to cents/counts"
            )
    units = (
        df.filter(F.col(unit_col).isNotNull())
        .groupBy(*group_cols, F.col(unit_col).alias("__u__"))
        .agg(
            F.coalesce(F.sum(F.col(num_col).cast("bigint")), F.lit(0)).alias(
                "__x__"
            ),
            F.coalesce(F.sum(F.col(den_col).cast("bigint")), F.lit(0)).alias(
                "__y__"
            ),
        )
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    g = units.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(d19("__x__")).cast("decimal(38,0)").alias("__sx__"),
        F.sum(d19("__y__")).cast("decimal(38,0)").alias("__sy__"),
        F.sum((d19("__x__") * d19("__x__")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__sxx__"),
        F.sum((d19("__y__") * d19("__y__")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__syy__"),
        F.sum((d19("__x__") * d19("__y__")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__sxy__"),
    )
    nn = F.col("n_units").cast("double")
    sx, sy = F.col("__sx__").cast("double"), F.col("__sy__").cast("double")
    sxx = F.col("__sxx__").cast("double")
    syy = F.col("__syy__").cast("double")
    sxy = F.col("__sxy__").cast("double")
    ratio = sx / sy
    ybar = sy / nn
    var_x = (sxx - sx * sx / nn) / (nn - F.lit(1.0))
    var_y = (syy - sy * sy / nn) / (nn - F.lit(1.0))
    cov = (sxy - sx * sy / nn) / (nn - F.lit(1.0))
    var_r = (
        (var_x - F.lit(2.0) * ratio * cov + ratio * ratio * var_y)
        / (nn * ybar * ybar)
    )
    # ANSI mode throws on /0 even for doubles, and `&` does not
    # short-circuit — the var_r divisions must sit under a NESTED when
    # so they only evaluate once n_units > 1 and Σy > 0 hold
    ok = (F.col("n_units") > 1) & (F.col("__sy__") > 0)
    guarded = lambda expr: F.when(  # noqa: E731
        ok, F.when(var_r >= 0, expr)
    )
    se = guarded(F.sqrt(var_r))
    return g.select(
        *group_cols,
        "n_units",
        F.when(F.col("__sy__") > 0, ratio).alias("ratio"),
        se.alias("se"),
        guarded(ratio - F.lit(float(z)) * F.sqrt(var_r)).alias("ci_lo"),
        guarded(ratio + F.lit(float(z)) * F.sqrt(var_r)).alias("ci_hi"),
    )


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    value_col: str,
) -> DataFrame:
    """Krippendorff's alpha for nominal data (Krippendorff, Content
    Analysis 2004) — the agreement coefficient that handles ANY number
    of raters per unit and missing ratings, which is the real shape of
    label-QA data (``cohens_kappa`` requires exactly two aligned
    raters). Rater identity is irrelevant for alpha; the input is one
    row per (unit, assigned value).

        D_o = Σ_u Σ_v n_uv·(m_u − n_uv)/(m_u − 1)   (observed disagreement)
        D_e = (N² − Σ_v n_v²)/(N − 1)               (expected by chance)
        alpha = 1 − D_o/D_e

    with m_u the ratings on unit u (units with m_u < 2 are unpairable
    and dropped), n_uv the count of value v on unit u, N = Σ m_u over
    pairable units, n_v the value marginals over pairable units.

    One (unit, value) contingency aggregate; per-unit disagreement
    terms are exact rationals QUANTIZED (×10⁹) before the global sum
    (the nelson_aalen convention); D_e is exact DECIMAL(38) integer
    algebra. NULL units are dropped; NULL VALUES are kept as a real
    category (a rater abstaining with an explicit null label is
    information — pre-filter upstream if not). alpha is NULL when
    D_e = 0 (every pairable rating identical).

    Output: ONE row — (n_units, n_ratings, d_o, d_e, alpha).
    """
    rows = df.filter(F.col(unit_col).isNotNull())
    uv = rows.groupBy(
        F.col(unit_col).alias("__u__"),
        F.col(value_col).alias("__v__"),
    ).agg(F.count(F.lit(1)).alias("__nuv__"))
    # per-unit totals ride a window on the (unit, value) relation —
    # same partitioning, no second corpus pass
    w_u = Window.partitionBy("__u__")
    uv = uv.withColumn("__mu__", F.sum("__nuv__").over(w_u)).filter(
        F.col("__mu__") >= 2
    )
    # the pairable (unit, value) relation feeds BOTH the disagreement
    # aggregate and the value marginals — checkpoint it so the corpus
    # scans once, not per branch (the t_closeness lesson)
    uv = uv.localCheckpoint(eager=True)
    q = F.round(
        F.col("__nuv__").cast("double")
        * (F.col("__mu__") - F.col("__nuv__")).cast("double")
        / (F.col("__mu__") - F.lit(1)).cast("double")
        * F.lit(1000000000.0)
    ).cast("bigint")
    per_v = uv.groupBy("__v__").agg(F.sum("__nuv__").alias("__nv__"))
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    marg = per_v.agg(
        F.sum(d19("__nv__")).cast("decimal(19,0)").alias("__N__"),
        F.sum((d19("__nv__") * d19("__nv__")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__snv2__"),
    )
    do_agg = uv.groupBy().agg(
        F.countDistinct("__u__").alias("n_units"),
        F.sum(q).alias("__qdo__"),
    )
    j = do_agg.crossJoin(F.broadcast(marg))
    n_big = F.col("__N__")
    de = (
        (n_big * n_big).cast("decimal(38,0)") - F.col("__snv2__")
    ).cast("double") / (n_big.cast("double") - F.lit(1.0))
    d_o = F.col("__qdo__").cast("double") / F.lit(1000000000.0)
    return j.select(
        "n_units",
        F.col("__N__").cast("bigint").alias("n_ratings"),
        d_o.alias("d_o"),
        F.when(n_big > 1, de).alias("d_e"),
        F.when((n_big > 1) & (de > 0), F.lit(1.0) - d_o / de).alias(
            "alpha"
        ),
    )


def eb_rate_shrinkage(
    df: DataFrame,
    key_cols: Sequence[str],
    success_col: str,
    trial_col: str,
    min_trials: int = 1,
) -> DataFrame:
    """Empirical-Bayes rate shrinkage (beta-binomial, method of moments
    — the Robinson 'batting average' recipe): per-key success rates
    k_i/n_i are noisy exactly where n_i is small, so fit a Beta(α, β)
    prior to the OBSERVED rate distribution and report the posterior
    mean ``(k_i + α)/(n_i + α + β)`` — small-sample keys shrink toward
    the global rate, high-volume keys keep their own. The standard
    smoothing for CTRs, defect rates, and per-source quality scores
    before ranking by them.

    Moments: with m and v the sample mean/variance of the per-key rates
    (keys with n_i ≥ ``min_trials``), ``c = m(1−m)/v − 1``, α = m·c,
    β = (1−m)·c. Per-key rates are QUANTIZED (×10⁴ int64) so the moment
    sums are exact integers and α/β a fixed IEEE chain — hash-stable
    cross-engine. The cross-engine exactness condition is on the SUM,
    not the count alone: ``nk · max(qr)² < 2⁵³`` (128-bit-int→double
    conversion above 2⁵³ can differ by 1 ulp between engines). At the
    4dp quantum that holds to ~9·10⁷ keys even at rate 1.0 and ~1.4·10⁹
    keys at rates ≤ 0.25; 4dp rate precision shifts the fitted prior by
    ≪ the shrinkage it applies (quantization variance (10⁻⁴)²/12 only
    matters when v ≲ 10⁻⁷, where c ≤ 0 declares the fit degenerate
    anyway). Degenerate fits (v = 0 or c ≤ 0 — rates tighter than
    a binomial allows, nothing to shrink) emit the raw rates with NULL
    alpha/beta/shrunk (stated, not hidden).

    ``success_col``/``trial_col`` must be integer-typed per-key totals
    (aggregate upstream); rows with NULL/zero trials below
    ``min_trials`` are excluded from BOTH the fit and the output.

    Output: (*key_cols, successes, trials, rate, alpha, beta, shrunk).
    """
    if min_trials < 1:
        raise ValueError(f"min_trials must be >= 1, got {min_trials}")
    types = dict(df.dtypes)
    for c in (success_col, trial_col):
        if types.get(c) not in _INT_TYPES:
            raise ValueError(
                f"{c} must be integer-typed, got {types.get(c)!r}"
            )
    keys = (
        df.filter(
            F.col(trial_col).isNotNull()
            & (F.col(trial_col) >= min_trials)
            & F.col(success_col).isNotNull()
        )
        .select(
            *key_cols,
            F.col(success_col).cast("bigint").alias("__k__"),
            F.col(trial_col).cast("bigint").alias("__n__"),
        )
    )
    qrate = F.round(
        F.col("__k__").cast("double")
        / F.col("__n__").cast("double")
        * F.lit(10000.0)
    ).cast("bigint")
    keys = keys.withColumn("__qr__", qrate)
    # the per-key relation feeds BOTH the moment fit and the scored
    # output — checkpoint it so the upstream (often a full-table
    # aggregate) runs once, not per branch
    keys = keys.localCheckpoint(eager=True)
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    mom = keys.agg(
        F.count(F.lit(1)).alias("__nk__"),
        F.sum(d19("__qr__")).cast("decimal(38,0)").alias("__sr__"),
        F.sum((d19("__qr__") * d19("__qr__")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__srr__"),
    )
    nk = F.col("__nk__").cast("double")
    m = F.col("__sr__").cast("double") / F.lit(10000.0) / nk
    v = F.when(
        F.col("__nk__") > 1,
        (
            F.col("__srr__").cast("double") / F.lit(1.0e8)
            - (F.col("__sr__").cast("double") / F.lit(10000.0))
            * (F.col("__sr__").cast("double") / F.lit(10000.0))
            / nk
        )
        / (nk - F.lit(1.0)),
    )
    c = F.when((v.isNotNull()) & (v > 0), m * (F.lit(1.0) - m) / v - F.lit(1.0))
    alpha = F.when(c > 0, m * c)
    beta = F.when(c > 0, (F.lit(1.0) - m) * c)
    fit = mom.select(alpha.alias("__alpha__"), beta.alias("__beta__"))
    out = keys.crossJoin(F.broadcast(fit))
    rate = F.col("__k__").cast("double") / F.col("__n__").cast("double")
    a, b = F.col("__alpha__"), F.col("__beta__")
    return out.select(
        *key_cols,
        F.col("__k__").alias("successes"),
        F.col("__n__").alias("trials"),
        rate.alias("rate"),
        a.alias("alpha"),
        b.alias("beta"),
        F.when(
            a.isNotNull(),
            (F.col("__k__").cast("double") + a)
            / (F.col("__n__").cast("double") + a + b),
        ).alias("shrunk"),
    )


# two-sided alpha=0.05 and power=0.80 normal quantiles, written as exact
# double literals so both engines compute the identical chain (erfinv
# stays out of the contract — the logrank no-libm rule)
_Z_ALPHA_050 = 1.959963984540054
_Z_POWER_080 = 0.8416212335729143


def power_analysis(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rel_mde: float = 0.02,
) -> DataFrame:
    """Two-sample A/B sample-size planning from observed variance — the
    DESIGN step the analysis family (welch/cuped/did/ratio_delta)
    assumes already happened: per group, the units per arm needed to
    detect a ``rel_mde`` relative lift of the mean at two-sided α=0.05
    and 80% power, ``n = 2·(z_α + z_β)²·σ² / (rel_mde·μ)²`` (Lehr's
    standard normal-approximation formula).

    ONE partial-combined aggregate yields exact int64 (n, Σy, Σy²);
    mean, sample variance, and the requirement are a fixed IEEE chain
    over them with the z quantiles as exact double literals (no erfinv
    in the contract). ``value_col`` must be integer-typed (cents);
    keep Σy² under 2⁵³ per group (the smd contract). NULL values are
    dropped. n_required is NULL when the group has n ≤ 1, zero
    variance, or zero mean (no effect size to scale by).

    Output: (*group_cols, n_obs, mean, variance, n_required).
    """
    if not 0 < rel_mde < 1:
        raise ValueError(f"rel_mde must be in (0, 1), got {rel_mde}")
    types = dict(df.dtypes)
    if types.get(value_col) not in _INT_TYPES:
        raise ValueError(
            f"value_col must be integer-typed, got "
            f"{types.get(value_col)!r} — rescale to cents"
        )
    y = F.col(value_col).cast("bigint")
    g = (
        df.filter(y.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(y).alias("__sy__"),
            F.sum(y * y).alias("__syy__"),
        )
    )
    n = F.col("n_obs").cast("double")
    sy = F.col("__sy__").cast("double")
    syy = F.col("__syy__").cast("double")
    mean = sy / n
    var = (syy - sy * sy / n) / (n - F.lit(1.0))
    z2 = F.lit((_Z_ALPHA_050 + _Z_POWER_080) ** 2)
    delta = F.lit(float(rel_mde)) * mean
    n_req = F.ceil(F.lit(2.0) * z2 * var / (delta * delta))
    ok = (F.col("n_obs") > 1) & (F.col("__sy__") != 0)
    return g.select(
        *group_cols,
        "n_obs",
        mean.alias("mean"),
        F.when(F.col("n_obs") > 1, var).alias("variance"),
        F.when(ok, F.when(var > 0, n_req)).alias("n_required"),
    )
