"""Window-function operators.

The reference has no window operator — the *pattern* is sorted-group
iteration with carried state (SURVEY §2.7). All four library ops here compile
to native window functions (JVM-side, single shuffle on the partition key).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pangool_spark.orderby import OrderBy


def _order_cols(order_by: OrderBy | str | Sequence[Column]):
    if isinstance(order_by, str):
        order_by = OrderBy.parse(order_by)
    if isinstance(order_by, OrderBy):
        return order_by.columns()
    return list(order_by)


def top_k(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: OrderBy | str | Sequence[Column],
    k: int,
    rank_col: str | None = None,
    method: str = "row_number",
) -> DataFrame:
    """Top-k rows per group.

    Ref: heap-based top-N per (location,date) (``EX/topnhashtags/
    TopNHashTags.java:92-134``) and first-k of a sorted group
    (``EX/topicalwordcount/TopicFingerprint.java:64-79``). Compiled to
    ``row_number()/rank()/dense_rank() OVER (PARTITION BY ... ORDER BY ...)``
    — Spark pushes a per-partition heap (WindowGroupLimit) below the shuffle,
    exactly the reference's map-side heap trick but automatic.
    """
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    ranked = df.withColumn("__rank__", fn().over(w)).filter(F.col("__rank__") <= k)
    if rank_col:
        return ranked.withColumnRenamed("__rank__", rank_col)
    return ranked.drop("__rank__")


def moving_average(
    df: DataFrame,
    partition_by: Sequence[str],
    order_col: str,
    value_col: str,
    window_size: int,
    out_col: str = "moving_avg",
    range_based: bool = True,
) -> DataFrame:
    """Trailing-window average per key.

    Ref ``EX/movingaverage/MovingAverage.java:51-137`` (queue of the last n
    days per url). ``range_based=True`` reproduces the reference exactly: the
    frame covers *values* within ``[current - (n-1), current]`` of a numeric
    order column (missing days shrink the window, as the reference's
    date-pruned queue does). ``range_based=False`` gives a row-count frame.
    """
    w = Window.partitionBy(*partition_by).orderBy(F.col(order_col))
    if range_based:
        w = w.rangeBetween(-(window_size - 1), 0)
    else:
        w = w.rowsBetween(-(window_size - 1), 0)
    return df.withColumn(out_col, F.avg(value_col).over(w))


def normalize_by_group_total(
    df: DataFrame,
    partition_by: Sequence[str],
    value_col: str,
    out_col: str = "ratio",
) -> DataFrame:
    """value / sum(value) over the partition.

    Ref ``EX/useractivitynormalizer/UserActivityNormalizer.java:46-153``,
    which needed a mapper double-emit + boolean sort trick + rollup to see
    the group total before the detail rows; a window total is one shuffle
    and no row duplication.
    """
    w = Window.partitionBy(*partition_by)
    return df.withColumn(out_col, F.col(value_col) / F.sum(value_col).over(w))


def lead_lag(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: OrderBy | str | Sequence[Column],
    col: str,
    offset: int = 1,
) -> DataFrame:
    """lead/lag — no reference counterpart (SURVEY §2.7), Spark superset."""
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    return df.withColumn(f"{col}_lag", F.lag(col, offset).over(w)).withColumn(
        f"{col}_lead", F.lead(col, offset).over(w)
    )


def resample_forward_fill(
    df: DataFrame,
    key_cols,
    ts_col: str,
    value_cols,
    step: int,
    start=None,
    end=None,
) -> DataFrame:
    """Regularize an irregular per-key time series onto a fixed grid with
    forward fill — the gap-filling/resampling step every feature
    pipeline needs before windowed aggregation (sensor readings, price
    ticks, metric scrapes arrive irregularly; models want one row per
    key per step).

    ``ts_col`` is numeric (epoch seconds/millis — convert timestamps
    first); the grid is ``start, start+step, …, end`` (defaults: each
    key's own min/max observation, floored to the grid). Observed rows
    at a grid point win; gaps carry the LAST observed value forward
    (nulls before the first observation). Multiple observations in one
    step: the latest (max ``ts_col``) wins, ties resolved by the larger
    value tuple — deterministic, engine-replicable.

    Explicit-bound edge cases (r07 advice): observations BEFORE an
    explicit ``start`` are folded into the start bucket (latest still
    wins), so the first grid rows forward-fill from the last pre-start
    value instead of starting NULL. With an explicit ``end`` but
    per-key start, a key whose observations all land after ``end``
    has no grid rows (lo > hi is filtered, never a sequence() error);
    with BOTH bounds explicit every key gets the full grid (such a key
    shows all-NULL values). An explicit ``start > end`` raises.

    Scale shape: the spine is generated per key with one ``sequence``
    explode — (range/step) rows per key, no driver loop, no cross join —
    and the fill is one ``last(ignorenulls)`` running window per key.
    One exchange (the window's hash partition), plan-gated.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    vals = [value_cols] if isinstance(value_cols, str) else list(value_cols)

    start_b = int(start) // step * step if start is not None else None
    end_b = int(end) // step * step if end is not None else None
    if start_b is not None and end_b is not None and start_b > end_b:
        raise ValueError(
            f"start ({start}) is after end ({end}) on the {step}-grid"
        )
    bucket = (F.floor(F.col(ts_col) / F.lit(step)) * F.lit(step)).cast("long")
    if start_b is not None:
        # fold pre-start observations into the start bucket so the first
        # grid rows fill from the last value seen before the window
        bucket = F.greatest(bucket, F.lit(start_b).cast("long"))
    # latest observation per (key, bucket): max (ts, values-struct)
    per_bucket = (
        df.select(
            *keys,
            bucket.alias("__b__"),
            F.struct(F.col(ts_col).alias("__t__"), *[F.col(v) for v in vals]).alias(
                "__obs__"
            ),
        )
        .groupBy(*keys, "__b__")
        .agg(F.max("__obs__").alias("__obs__"))
    )
    lo = F.lit(start_b) if start_b is not None else F.min("__b__")
    hi = F.lit(end_b) if end_b is not None else F.max("__b__")
    spine = (
        per_bucket.groupBy(*keys)
        .agg(lo.alias("__lo__"), hi.alias("__hi__"))
        # a key entirely after an explicit end has lo > hi: no grid rows
        # (sequence() with a positive step would raise on lo > hi)
        .filter(F.col("__lo__") <= F.col("__hi__"))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("__lo__"), F.col("__hi__"), F.lit(step))
            ).alias("__b__"),
        )
    )
    joined = spine.join(per_bucket, keys + ["__b__"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("__b__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        *keys,
        F.col("__b__").alias(ts_col),
        *[
            F.last(F.col("__obs__")[v], ignorenulls=True).over(w).alias(v)
            for v in vals
        ],
    )
    return filled


def ewma(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average — the standard
    monitoring smoother: ``acc = alpha*x + (1-alpha)*acc`` folded over
    the key's values in ``order_by`` order, seeded with the FIRST value
    (the pandas ``ewm(adjust=False)`` recursion). Returns one row per
    key: (keys..., n_obs, out_col).

    Engine-portable by construction: one partial-agg shuffle collects
    (order, value) structs, ``array_sort`` fixes a total order (callers
    must include a tiebreak column for deterministic results), and a JVM
    ``aggregate`` fold runs the recursion left-to-right — the binary64
    op sequence is identical to DuckDB's ``list_reduce(list(v ORDER BY
    ...), (acc, x) -> a*x + (1-a)*acc)``, so results hash-match
    bit-for-bit (the fold-sorted-doubles contract). The complement is
    COMPUTED as ``1.0 - alpha`` (never a pre-rounded literal) so both
    engines perform the same IEEE subtraction.

    Per-key state is the collected list: bounded by the key's
    observation count (the funnel ``mode='fold'`` contract — keys with
    unbounded histories belong in the streaming running-total operator,
    which carries O(1) state instead).
    """
    beta = 1.0 - alpha
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                *[F.col(c) for c in order_by], F.col(value_col).alias("__v__")
            )
        )
    )
    vals = F.transform(arr, lambda s: s["__v__"].cast("double"))
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(beta) * acc,
    )
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"), fold.alias(out_col)
    )


def gaps_islands(
    df: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    out_prefix: str = "island",
) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE integer positions
    per key (active-day streaks, unbroken sequence ranges, contiguous
    id blocks). The classic row_number trick — for distinct positions
    sorted per key, ``pos - row_number()`` is constant exactly within a
    consecutive run — turned into three narrow hash shuffles:

        distinct (key, pos)  →  per-key window row_number
                             →  groupBy (key, pos - rn) min/max/count

    No per-key collect and no global sort: every stage is keyed by the
    group columns (plus the run id), so a key's data never needs to fit
    anywhere but its own partition slice, and duplicate positions are
    collapsed BEFORE the window (the window sees |distinct days|, not
    |events|). Skew bound: one key's distinct positions in one task —
    the same bound any per-key sessionization already accepts.

    ``seq_col`` must be integer-typed (rescale dates to epoch days
    first); rows with NULL key or position are dropped (no run
    membership is defined for them).

    Output: (*keys, <prefix>_start, <prefix>_end, <prefix>_len) with
    start/end as BIGINT positions and len = end - start + 1 distinct
    positions. Engine-portable end-to-end: integer arithmetic only.
    """
    if not keys:
        raise ValueError("gaps_islands needs at least one key column")
    types = dict(df.dtypes)
    if types.get(seq_col) not in {"tinyint", "smallint", "int", "bigint"}:
        raise ValueError(
            f"seq_col {seq_col!r} must be integer-typed, got "
            f"{types.get(seq_col)!r} — rescale dates to epoch days first"
        )
    kc = [F.col(k) for k in keys]
    pos = F.col(seq_col).cast("bigint")
    keep = pos.isNotNull()
    for k in kc:
        keep = keep & k.isNotNull()
    d = df.filter(keep).select(*kc, pos.alias("__pos__")).distinct()
    w = Window.partitionBy(*keys).orderBy("__pos__")
    runs = d.withColumn(
        "__grp__", F.col("__pos__") - F.row_number().over(w)
    )
    return (
        runs.groupBy(*keys, "__grp__")
        .agg(
            F.min("__pos__").alias(f"{out_prefix}_start"),
            F.max("__pos__").alias(f"{out_prefix}_end"),
            F.count(F.lit(1)).alias(f"{out_prefix}_len"),
        )
        .drop("__grp__")
    )


def holt_linear(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    alpha: float,
    beta: float,
    out_prefix: str = "holt",
) -> DataFrame:
    """Per-key Holt linear (double) exponential smoothing — ``ewma``'s
    trend-aware sibling, the standard short-horizon forecaster:

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    seeded l_0 = x_0, b_0 = 0 (trend is learned through β, so
    single-observation keys are well-defined). One partial-agg shuffle
    collects (order, value) structs, ``array_sort`` fixes the total
    order, and a JVM ``aggregate`` fold with a (level, trend) struct
    accumulator runs the coupled recursion left-to-right — per-key
    state is the collected list (the ``ewma``/funnel bounded-history
    contract).

    Outputs are ROUNDED to 9 decimals: measured (DuckDB 1.0.0), a
    ``list_reduce`` lambda whose accumulator elements share a compound
    subexpression (the recomputed l_t inside b_t) evaluates with fused
    rounding — up to ~2e-13 absolute drift over 200 steps against the
    engine's own scalar arithmetic — so raw doubles are not a
    cross-engine contract here (the bm25 round-9 precedent; struct
    accumulators are outright miscomputed and must not be used in
    oracles at all). Complements are COMPUTED as 1−α / 1−β so both
    engines perform the same IEEE subtraction.

    Output: (keys..., n_obs, <prefix>_level, <prefix>_trend,
    <prefix>_forecast) with forecast = level + trend (h=1), rounded
    after the unrounded add.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    ca, cb = 1.0 - alpha, 1.0 - beta
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                *[F.col(c) for c in order_by], F.col(value_col).alias("__v__")
            )
        )
    )
    vals = F.transform(arr, lambda s: s["__v__"].cast("double"))
    init = F.struct(
        F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("b")
    )
    newl = lambda acc, x: F.lit(alpha) * x + F.lit(ca) * (acc["l"] + acc["b"])  # noqa: E731
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        init,
        lambda acc, x: F.struct(
            newl(acc, x).alias("l"),
            (
                F.lit(beta) * (newl(acc, x) - acc["l"]) + F.lit(cb) * acc["b"]
            ).alias("b"),
        ),
    )
    g = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"), fold.alias("__st__")
    )
    st = F.col("__st__")
    return g.select(
        *keys,
        "n_obs",
        F.round(st["l"], 9).alias(f"{out_prefix}_level"),
        F.round(st["b"], 9).alias(f"{out_prefix}_trend"),
        F.round(st["l"] + st["b"], 9).alias(f"{out_prefix}_forecast"),
    )


def seasonal_decompose(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    period: int,
    phase_col: str | None = None,
) -> DataFrame:
    """Additive seasonal decomposition (classical moving-average form:
    y = trend + seasonal + residual) per key over an ordered integer
    series — the descriptive complement of ``backtest_seasonal_naive``
    and ``holt_linear``.

    Shape: one ROWS window of ±period//2 per key computes the centered
    trend (only FULL windows emit — the standard edge convention), one
    partial-combined aggregate per (key, phase) averages the detrended
    values into the seasonal profile, and a broadcast-sized join
    attaches it back.  ``phase_col`` supplies a calendar phase (e.g.
    weekday); absent, phase is row index mod period.

    Determinism contract (the exact-ratio discipline): ``value_col``
    must be integer-typed; the trend numerator is an exact int window
    sum; detrended values are kept as the exact integer
    ``period·y − Σwindow`` so the seasonal mean is one division of two
    exact integers; trend, seasonal, and residual are each a single
    fixed IEEE chain over exactly-agreed integers — bit-portable.
    Residual is DEFINED as ``(period·y − Σwindow)/period − seasonal``
    (not ``y − trend − seasonal``); both engines must use this form.

    ``period`` must be odd (centered window). ``order_col`` must be
    unique per key.  Output: (*keys, order_col, value, trend, seasonal,
    residual) — trend/residual NULL on the half-window edges.
    """
    if period < 3 or period % 2 == 0:
        raise ValueError(f"period must be an odd integer >= 3, got {period}")
    vt = dict(df.dtypes).get(value_col)
    if vt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"seasonal_decompose needs an integer value column, got "
            f"{value_col}: {vt} — rescale to cents"
        )
    keys = list(keys)
    half = period // 2
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-half, half)
    )
    wseq = Window.partitionBy(*keys).orderBy(order_col)
    if phase_col is not None:
        base = df.select(
            *keys,
            order_col,
            F.col(value_col).cast("bigint").alias("value"),
            F.col(phase_col).cast("bigint").alias("__phase__"),
        )
    else:
        base = df.select(
            *keys, order_col, F.col(value_col).cast("bigint").alias("value")
        ).withColumn("__phase__", (F.row_number().over(wseq) - 1) % period)
    t = base.select(
        *keys,
        order_col,
        "value",
        "__phase__",
        F.when(
            F.count(F.lit(1)).over(w) == period, F.sum("value").over(w)
        ).alias("__tsum__"),
    )
    season = (
        t.filter(F.col("__tsum__").isNotNull())
        .groupBy(*keys, "__phase__")
        .agg(
            F.sum(F.lit(period) * F.col("value") - F.col("__tsum__")).alias(
                "__snum__"
            ),
            F.count(F.lit(1)).alias("__sn__"),
        )
        .select(
            *keys,
            "__phase__",
            (
                F.col("__snum__").cast("double")
                / (F.lit(period) * F.col("__sn__")).cast("double")
            ).alias("seasonal"),
        )
    )
    out = t.join(season, [*keys, "__phase__"], "left")
    detr = (
        F.lit(period) * F.col("value") - F.col("__tsum__")
    ).cast("double") / F.lit(float(period))
    return out.select(
        *keys,
        order_col,
        "value",
        (F.col("__tsum__").cast("double") / F.lit(float(period))).alias(
            "trend"
        ),
        "seasonal",
        F.when(
            F.col("__tsum__").isNotNull(), detr - F.col("seasonal")
        ).alias("residual"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols,
    ts_col: str,
    value_col: str,
    tiebreak_cols=(),
) -> DataFrame:
    """Time-weighted average (TWAP) per key — the correct mean for
    irregularly-sampled state series (prices, sensor readings, feature
    values), where the plain AVG over-weights bursty periods: each
    observation holds until the next one, so it is weighted by its
    holding duration. The final observation of a key has no successor
    and is excluded from the weighting (standard half-open convention).

    Determinism contract: durations are exact integer SECONDS from the
    lead() timestamp (``unix_timestamp`` differences — the engine-
    replicable epoch conversion used across the catalog), values must be
    integer-typed (cents/micros), and the TWAP is one IEEE double
    division of the two exact BIGINT sums. Keys with a single
    observation emit NULL twap (zero weighted time); same-second
    successors contribute zero weight.

    Scale shape: one hash exchange on the keys (the lead window), then a
    partial-combined aggregate on the same partitioning — Catalyst
    reuses the exchange, so it is ONE shuffle end to end (plan-gated).

    Output: key_cols + (n_obs BIGINT, total_s BIGINT, twap DOUBLE).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ties = [tiebreak_cols] if isinstance(tiebreak_cols, str) else list(tiebreak_cols)
    if dict(df.dtypes).get(value_col) not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"time_weighted_avg needs an integer value column, got "
            f"{dict(df.dtypes).get(value_col)!r} — rescale to cents/micros"
        )
    w = Window.partitionBy(*keys).orderBy(ts_col, *ties)
    es = F.unix_timestamp(F.col(ts_col))
    nxt = F.lead(es).over(w)
    dur_s = (nxt - es).cast("bigint")
    staged = df.select(
        *keys,
        F.col(value_col).cast("bigint").alias("__v__"),
        dur_s.alias("__s__"),
    )
    # the groupBy keys match the window partitioning, so Catalyst reuses
    # the window's exchange: one shuffle, one scan end to end
    return staged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.coalesce(F.sum("__s__"), F.lit(0).cast("bigint")).alias("total_s"),
        F.when(
            F.coalesce(F.sum("__s__"), F.lit(0)) > 0,
            F.sum(F.col("__v__") * F.col("__s__")).cast("double")
            / F.sum("__s__").cast("double"),
        ).alias("twap"),
    )
