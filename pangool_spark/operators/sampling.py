"""Deterministic sampling & split assignment for training-data pipelines.

RNG-based sampling (``df.sample``/``sampleBy``) is seed-stable within one
engine but not reproducible across engines, reruns with different
partitioning, or documentation ("row X is in the sample because ...").
Hash-based sampling is the reproducible alternative the large-pipeline
world standardized on: a row's fate depends only on its KEY, so samples
are stable under repartitioning, joinable across tables sharing the key,
and auditable. All operators here are ZERO-shuffle projections/filters.

The hash is the engine-portable 31-bit md5 prefix (``dedup.base_hash_31``)
so every derived sample is value-oracle-checkable in DuckDB:
``('0x' || substr(md5(key), 1, 8))::BIGINT & 2147483647``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pangool_spark.operators.dedup import base_hash_31

#: hash buckets per key — fractions resolve to thresholds out of this
_BUCKETS = 1_000_000


def _bucket(key_col: str | Column) -> Column:
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return base_hash_31(c.cast("string")) % _BUCKETS


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash: deterministic,
    partition-independent, and consistent across tables that share the
    key (sampling customers here and orders by o_custkey with the same
    fraction yields JOINABLE samples — RNG sampling cannot do that)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket(key_col) < int(fraction * _BUCKETS))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[float],
    labels: Sequence[str] = ("train", "val", "test"),
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a split (train/val/test by default) by key hash.

    Deterministic and leakage-safe: every row with the same key lands in
    the same split forever, across reruns and engines — the property that
    matters when documents are re-crawled or pipelines re-run. Weights
    are normalized; boundaries are integer bucket thresholds so the
    assignment is exact and oracle-checkable."""
    if len(weights) != len(labels):
        raise ValueError("need one label per weight")
    if any(w < 0 for w in weights) or sum(weights) <= 0:
        raise ValueError("weights must be non-negative and sum > 0")
    total = float(sum(weights))
    bounds, acc = [], 0.0
    for w in weights[:-1]:
        acc += w / total
        bounds.append(int(acc * _BUCKETS))
    b = _bucket(key_col)
    expr = F.lit(labels[-1])
    for bound, label in zip(reversed(bounds), reversed(labels[:-1])):
        expr = F.when(b < bound, F.lit(label)).otherwise(expr)
    return df.withColumn(out_col, expr)


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction of rows, chosen by key hash (e.g. language rebalancing —
    downsample the dominant language, keep the rest whole). Strata absent
    from ``fractions`` default to 0.0 (dropped), mirroring
    ``DataFrame.sampleBy``; pass 1.0 to keep a stratum whole. Same
    zero-shuffle, rerun-stable, cross-table-joinable properties as
    ``hash_sample``."""
    for stratum, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {stratum!r} must be in [0, 1]")
    b = _bucket(key_col)
    threshold = F.lit(0)
    for stratum, f in fractions.items():
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(f * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(b < threshold)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 64,
) -> DataFrame:
    """Greedy contiguous sequence packing: assign documents to fixed
    token-budget bins (the training-prep step that turns documents into
    context-length rows). Documents are sharded by key hash, ordered by
    key within the shard, and bin k covers the contiguous run whose
    cumulative pre-sum falls in [k*budget, (k+1)*budget) — the standard
    greedy compromise (a bin may overrun by at most one document).

    Scale shape: the running sum is a window per SHARD, so no global
    single-task ordering exists; shards pack independently and in
    parallel (``n_shards`` ≥ cluster parallelism). Assignment is
    deterministic in the key alone — rerun- and engine-stable, like the
    other hash-based operators here.

    Output: (id, token count, shard, pack_id) — one row per document.
    """
    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    from pyspark.sql import Window

    shard = _bucket(id_col) % n_shards
    w = (
        Window.partitionBy("__shard__")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = df.select(
        F.col(id_col), F.col(token_col), shard.alias("__shard__")
    ).withColumn("__cum__", F.sum(token_col).over(w))
    return staged.select(
        F.col(id_col),
        F.col(token_col),
        F.col("__shard__").alias("shard"),
        F.floor((F.col("__cum__") - F.col(token_col)) / budget)
        .cast("int")
        .alias("pack_id"),
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    epoch: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic epoch-seeded global shuffle: every row gets a
    (shard, position) from the portable hash of ``key:epoch``.

    Training loops need the corpus in a random-looking order that is (a)
    reproducible for resume/debugging, (b) DIFFERENT each epoch, and (c)
    computed without a global single-task sort. Hashing the key with the
    epoch baked in gives an independent permutation per epoch; positions
    are dense per shard (readers consume shards independently, so a
    global row number — one task at 100 TB — is never needed). One
    shuffle: the per-shard ordering window. Ties on the 31-bit hash
    break on the key, keeping the order total and engine-replicable.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    from pyspark.sql import Window

    h = base_hash_31(F.concat(F.col(key_col).cast("string"), F.lit(f":{epoch}")))
    staged = df.withColumn("__h__", h).withColumn(
        shard_col, (F.col("__h__") % n_shards).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("__h__"), F.col(key_col))
    return (
        staged.withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("__h__")
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict,
) -> DataFrame:
    """Deterministic DATA MIXING: downsample strata so the output
    approximates the target mixture ``weights`` (e.g. 40% en / 15% each
    for four more languages) — the pre-training recipe step that turns
    "we crawled whatever the web had" into "the model sees the mixture we
    designed". No upsampling: the feasible total is pinned by the
    binding stratum (min countₛ/weightₛ keeps rate 1.0; every other
    stratum downsamples to match), so every emitted row is a distinct
    input row.

    Per-stratum keep rates are computed from one COUNT aggregate (the
    collect is bounded by |strata| — documented broadcast-scalar
    contract) and applied as hash thresholds: zero additional shuffles,
    rerun/partitioning/engine-stable like every sampler here. Strata
    missing from ``weights`` are dropped; a weighted stratum with no rows
    raises (a silent empty mixture would look like data loss downstream).

    Rate arithmetic is ordered ``T * w / count * buckets`` and truncated,
    so a SQL oracle replicates thresholds bit-for-bit in binary64.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("mixture weights must be positive")
    counts = {
        r["__s__"]: r["__c__"]
        for r in df.groupBy(F.col(strata_col).alias("__s__"))
        .agg(F.count(F.lit(1)).alias("__c__"))
        .collect()
    }
    missing = [s for s in weights if counts.get(s, 0) == 0]
    if missing:
        raise ValueError(f"weighted strata have no rows: {missing}")
    t = min(counts[s] / w for s, w in weights.items())
    b = _bucket(key_col)
    threshold = F.lit(0)
    for s, w in weights.items():
        threshold = F.when(
            F.col(strata_col) == s, F.lit(int(t * w / counts[s] * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(b < threshold)


def group_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int,
) -> DataFrame:
    """Deterministic per-group quota: keep (up to) ``k`` rows per group,
    chosen by key-hash order — source/domain capping ("at most N docs per
    domain"), the anti-monoculture counterpart of ``mixture_sample``'s
    proportional targets. Hash order makes the quota a uniform sample
    that is rerun/partitioning/engine-stable, unlike ``ORDER BY rand()``.

    Plan shape: one rank window per group — Spark pushes ``rank ≤ k``
    into WindowGroupLimit, so each task keeps a k-row heap per group and
    the full groups never materialize (plan-gated). Ties on the 31-bit
    hash break on the key, keeping selection total.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        _bucket(key_col), F.col(key_col)
    )
    return (
        df.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .drop("__rk__")
    )


def quantile_filter(
    df: DataFrame,
    value_col: str,
    q: float,
    group_col: str | None = None,
    keep: str = "upper",
) -> DataFrame:
    """Keep rows whose ``value_col`` clears the ``q``-th exact percentile
    of their group — threshold-free quality curation ("top quartile of
    quality per language") where an absolute cutoff would over-prune one
    stratum and under-prune another.

    The per-group threshold is ONE partial-aggregated percentile pass
    (exact interpolated percentile — matches ANSI ``quantile_cont`` /
    ``percentile_cont`` for oracles); the thresholds relation has one row
    per group, so the join back is broadcast-sized and the input scans
    once per side. ``keep='upper'`` keeps value ≥ threshold, ``'lower'``
    keeps ≤. NULL values are excluded from the percentile (SQL aggregate
    semantics) and never pass the filter — a row whose quality signal is
    unknown does not survive a quality cut.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if keep not in ("upper", "lower"):
        raise ValueError(f"keep must be upper|lower, got {keep!r}")
    group = [group_col] if group_col else []
    thr = df.groupBy(*group).agg(
        F.percentile(value_col, q).alias("__thr__")
    )
    joined = (
        df.join(F.broadcast(thr), group) if group else df.crossJoin(F.broadcast(thr))
    )
    cond = (
        F.col(value_col) >= F.col("__thr__")
        if keep == "upper"
        else F.col(value_col) <= F.col("__thr__")
    )
    return joined.filter(cond).drop("__thr__")


def split_bounds_sql(weights: Sequence[float]) -> list[int]:
    """The integer bucket thresholds ``hash_split`` uses, exposed so SQL
    oracles replicate the exact boundaries."""
    total = float(sum(weights))
    bounds, acc = [], 0.0
    for w in weights[:-1]:
        acc += w / total
        bounds.append(int(acc * _BUCKETS))
    return bounds


def approx_quantiles_sampled(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float],
    key_col: str | None = None,
    fraction: float = 0.1,
) -> DataFrame:
    """Quantile ESTIMATES from a deterministic hash sample — the
    100 TB answer to "give me p50/p95/p99 of a measure" when an exact
    percentile would sort-shuffle every value: sample rows by the
    portable content hash of ``key_col`` (or of the value itself), then
    take EXACT interpolated percentiles of the sample. Statistically the
    usual √(p(1−p)/n) quantile-estimator error; operationally the full
    column never reaches an exchange — only the ``fraction`` slice does.

    Deterministic and engine-replicable (no RNG): the same md5 bucket
    contract as ``hash_sample``, and Spark's exact ``percentile`` over
    the sample matches DuckDB ``quantile_cont`` bit-for-bit (pinned by
    tests/test_property_percentile.py) — so even the ESTIMATES carry a
    full value oracle, which no RNG- or t-digest-based approximation can.

    Output: one row per prob: (p, value). NULL values are excluded (SQL
    aggregate semantics).
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probs must be in [0, 1], got {p}")
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    key = key_col if key_col is not None else value_col
    sampled = df.filter(_bucket(key) < int(fraction * _BUCKETS))
    # ONE aggregate for every requested prob (percentile takes an array),
    # then unpack positionally — never one scan per quantile
    probs_arr = F.array(*[F.lit(float(p)) for p in probs])
    return (
        sampled.agg(F.percentile(value_col, probs_arr).alias("__v__"))
        .select(F.posexplode("__v__").alias("__i__", "value"))
        .select(
            F.element_at(probs_arr, F.col("__i__") + 1).alias("p"),
            F.col("value").cast("double").alias("value"),
        )
    )


def weighted_systematic_sample(
    df: DataFrame,
    order_by: Sequence[str],
    weight_col: str,
    n: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """Deterministic probability-proportional-to-size (PPS) sampling of
    ~``n`` rows via SYSTEMATIC selection over cumulative-weight space:
    lay the rows out on [0, W) by their integer weights (the
    distributed prefix sum — never a one-task window), then take the n
    selection points k·W/n (k = 1..n); a row is selected iff a point
    lands in its weight interval. P(selected) ≈ n·w/W, rows with
    w ≥ W/n are ALWAYS selected (the classic PPS regime), and —
    unlike Efraimidis–Spirakis keys — there is no RNG and no pow/log,
    so the selection is rerun-stable, engine-portable, and fully
    value-oracle-able: the count of points in (a, b] is
    floor(b·n/W) − floor(a·n/W), pure int64 arithmetic.

    Weights must be non-negative integers (rescale to cents/micros);
    zero-weight rows are never selected. Raises when W·n would overflow
    int64 (rescale weights down). Requires a total ``order_by`` for
    determinism. Output: selected input rows + ``n_points`` (how many
    selection points the row's interval absorbed — its multiplicity in
    a with-replacement reading).
    """
    from pangool_spark.operators.partitioning import global_running_sum

    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    vt = dict(df.dtypes).get(weight_col)
    if vt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"weights must be integer-typed, got {weight_col}: {vt}"
        )
    neg = df.filter(F.col(weight_col) < 0).limit(1).count()
    if neg:
        raise ValueError("weights must be non-negative")
    run = global_running_sum(
        df, order_by, weight_col, out_col="__run__", n_buckets=n_buckets
    )
    total = df.agg(F.sum(F.col(weight_col).cast("bigint"))).first()[0] or 0
    if total <= 0:
        return df.limit(0).withColumn("n_points", F.lit(0).cast("bigint"))
    if total > (2**63 - 1) // n:
        raise ValueError(
            f"W*n = {total}*{n} would overflow int64 — rescale weights"
        )
    # INTEGER division (DIV), not "/": bigint/bigint in Spark is DOUBLE
    # division, whose 53-bit mantissa mis-floors near the int64 range.
    # Operands are non-negative, so DIV (truncate) == floor exactly.
    run = run.withColumn(
        "__a__",
        F.col("__run__") - F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0)),
    )
    pts = F.expr(f"(__run__ * {n}L) DIV {total}L") - F.expr(
        f"(__a__ * {n}L) DIV {total}L"
    )
    return (
        run.withColumn("n_points", pts)
        .filter(F.col("n_points") >= 1)
        .select(*df.columns, "n_points")
    )


def negative_sample(
    positives: DataFrame,
    items: DataFrame,
    n_neg: int,
    user_col: str = "user_id",
    item_col: str = "item_id",
    tries_factor: int = 3,
) -> DataFrame:
    """Deterministic hash-walk NEGATIVE sampling for contrastive /
    recommender training pairs: for every user in ``positives``, draw up
    to ``n_neg`` items the user has NO positive interaction with,
    uniformly over the item universe, with a fate that is a pure
    function of (user, try-index) — rerun-, repartition- and
    engine-stable (the hash-sampling charter of this module).

    The walk: try t ∈ [0, n_neg·tries_factor) maps to item index
    ``base_hash_31(user ':' t) % n_items``; candidates that hit a
    positive or a repeated item are discarded, survivors rank by t and
    the first ``n_neg`` win. Users whose tries exhaust (dense positive
    rows over a small universe) return fewer than ``n_neg`` rows —
    deterministically, both engines agree which (the standard
    rejection-sampling concession; raise ``tries_factor`` to shrink it).

    Scale shape: the item universe gets dense 0-based indices via
    sample-sort ``stable_row_ids`` (no single-task global window), the
    candidate join is an equi-join on the index (AQE broadcasts the dim
    when it fits), rejection is one anti-join against the distinct
    positives, and ranking windows over ≤ tries rows per user. The only
    driver scalar is ``n_items`` (bounded-collect contract: counting a
    dimension).

    Output: (user_col, item_col, neg_rank) with neg_rank in [1, n_neg].
    """
    if n_neg < 1:
        raise ValueError(f"n_neg must be >= 1, got {n_neg}")
    if tries_factor < 1:
        raise ValueError(f"tries_factor must be >= 1, got {tries_factor}")
    from pyspark.sql import Window

    from pangool_spark.operators.partitioning import stable_row_ids

    universe = items.select(item_col).distinct()
    # size the modulus from the UNIVERSE, not the indexed relation: the
    # count is the same, the plan is one aggregate instead of the full
    # rank pipeline (and pruning a count() down through the rank window
    # trips an internal Catalyst binding error on tiny local relations)
    n_items = universe.count()
    if n_items == 0:
        raise ValueError("items universe is empty")
    indexed = stable_row_ids(universe, [item_col], id_col="__rid__").select(
        (F.col("__rid__") - 1).alias("__idx__"), F.col(item_col)
    )
    tries = n_neg * tries_factor
    users = positives.select(user_col).distinct()
    cand = users.select(
        user_col,
        F.explode(F.sequence(F.lit(0), F.lit(tries - 1))).alias("__t__"),
    ).select(
        user_col,
        "__t__",
        (
            base_hash_31(
                F.concat_ws(
                    ":",
                    F.col(user_col).cast("string"),
                    F.col("__t__").cast("string"),
                )
            )
            % F.lit(n_items)
        ).alias("__idx__"),
    )
    pos = positives.select(user_col, item_col).distinct()
    hits = cand.join(indexed, "__idx__").join(
        pos, [user_col, item_col], "left_anti"
    )
    first = hits.groupBy(user_col, item_col).agg(F.min("__t__").alias("__t__"))
    w = Window.partitionBy(user_col).orderBy("__t__")
    return (
        first.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= n_neg)
        .select(user_col, item_col, "neg_rank")
    )


def temporal_split(
    df: DataFrame,
    ts_col: str,
    train_end: str,
    embargo: str = "0 days",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe TEMPORAL train/test split with an embargo gap — the
    time-series counterpart of ``hash_split``: rows strictly before
    ``train_end`` are 'train', rows inside [train_end, train_end +
    embargo) are 'embargo' (kept and labeled, NEVER silently dropped —
    the caller decides), the rest are 'test'. The embargo purges
    look-ahead leakage through windowed/lagged features whose horizon
    spans the boundary (the purged-split regime of financial ML;
    López de Prado 2018, ch. 7).

    Pure row-local labeling: zero shuffles, survives any partitioning,
    pushes down to the scan. ``train_end`` is an ISO timestamp string,
    ``embargo`` an INTERVAL literal ('3 days', '12 hours'). Rows with
    NULL timestamps label NULL (no temporal position).
    """
    import re

    if not re.fullmatch(r"\d+\s+[A-Za-z]+", embargo.strip()):
        raise ValueError(
            f"embargo must look like '<n> <unit>' (e.g. '3 days'), got "
            f"{embargo!r}"
        )
    ts = F.col(ts_col)
    end = F.lit(train_end).cast("timestamp")
    cutoff = end + F.expr(f"INTERVAL {embargo.strip()}")
    return df.withColumn(
        out_col,
        F.when(ts.isNull(), F.lit(None).cast("string"))
        .when(ts < end, F.lit("train"))
        .when(ts < cutoff, F.lit("embargo"))
        .otherwise(F.lit("test")),
    )


def mixture_plan(
    df: DataFrame,
    source_col: str,
    token_count_col: str,
    weights: "dict[str, float]",
    budget_tokens: int,
) -> DataFrame:
    """Data-recipe planning: given a token budget and target mixture
    weights per source, compute what each source can actually supply —
    the step BEFORE ``mixture_sample`` draws anything. Training-data
    pipelines negotiate recipes in exactly these terms (desired vs
    available tokens, per-source sampling rate, deficit when a source
    can't fill its slice), and getting the arithmetic out of a
    spreadsheet and onto the corpus itself keeps the plan honest at
    100 TB: one partial-combined aggregate per source, then pure
    expression arithmetic on |sources| rows.

    Determinism: available tokens are exact BIGINT sums; desired =
    floor(budget * weight) is one IEEE multiply + floor; rate is one
    double division. Sources absent from ``weights`` get weight 0 (they
    still appear, carrying their availability); weights need not sum
    to 1 (the plan reports, it does not normalize).

    Output: (source, n_docs BIGINT, avail_tokens BIGINT, weight DOUBLE,
    desired_tokens BIGINT, rate DOUBLE, planned_tokens BIGINT,
    deficit_tokens BIGINT).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    avail = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_count_col).cast("bigint")).alias("avail_tokens"),
    )
    return plan_from_counts(avail, weights, budget_tokens)


def plan_from_counts(
    avail: DataFrame,
    weights: "dict[str, float]",
    budget_tokens: int,
) -> DataFrame:
    """The expression half of ``mixture_plan``, applied to an
    already-aggregated (source, n_docs, avail_tokens) relation — shared
    with ``streaming.stream_mixture_monitor`` so the live monitor's
    report is the SAME arithmetic as the batch plan (stream == batch
    parity is structural, not coincidental)."""
    wexpr = F.lit(0.0)
    for s, w in sorted(weights.items()):
        wexpr = F.when(F.col("source") == s, F.lit(float(w))).otherwise(wexpr)
    desired = F.floor(F.lit(int(budget_tokens)).cast("double") * wexpr).cast(
        "bigint"
    )
    planned = F.least(desired, F.col("avail_tokens"))
    return (
        avail.withColumn("weight", wexpr)
        .withColumn("desired_tokens", desired)
        .select(
            "source",
            "n_docs",
            "avail_tokens",
            "weight",
            "desired_tokens",
            F.when(
                F.col("avail_tokens") > 0,
                F.least(
                    F.lit(1.0),
                    F.col("desired_tokens").cast("double")
                    / F.col("avail_tokens").cast("double"),
                ),
            ).otherwise(F.lit(0.0)).alias("rate"),
            planned.alias("planned_tokens"),
            F.greatest(
                F.col("desired_tokens") - F.col("avail_tokens"),
                F.lit(0).cast("bigint"),
            ).alias("deficit_tokens"),
        )
    )


def temperature_plan(
    df: DataFrame,
    source_col: str,
    token_count_col: str,
    tau: float,
    budget_tokens: int,
) -> DataFrame:
    """Temperature-scaled data-recipe planning: target weights derived
    FROM the corpus itself as ``w_s ∝ avail_tokens_s^τ`` (normalized) —
    the multilingual/multi-source pre-training convention (τ = 1 keeps
    natural proportions, τ → 0 flattens toward uniform, τ ≈ 0.7 is the
    usual low-resource boost) — then the same desired/rate/deficit
    report as ``mixture_plan``, whose hand-written ``weights`` dict this
    replaces with in-plan arithmetic.

    Same shape as ``mixture_plan``: one partial-combined aggregate per
    source, then expression arithmetic on the |sources|-row relation
    (the window below runs over that tiny relation, not the data).
    Determinism: available tokens are exact BIGINT sums; the only
    non-correctly-rounded libm call is ``pow`` inside the weight, so
    the normalized weight is rounded to 9 decimals (the engine-drift
    convention) before ``desired = floor(budget · w)``.

    Output: (source, n_docs BIGINT, avail_tokens BIGINT, weight DOUBLE,
    desired_tokens BIGINT, rate DOUBLE, planned_tokens BIGINT,
    deficit_tokens BIGINT) — column-compatible with ``mixture_plan``.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    if tau < 0:
        raise ValueError(f"tau must be non-negative, got {tau}")
    from pyspark.sql import Window

    avail = (
        df.filter(F.col(source_col).isNotNull())
        .groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_count_col).cast("bigint")).alias(
                "avail_tokens"
            ),
        )
    )
    w_all = Window.partitionBy()  # |sources| rows — the point of the plan
    y = F.when(
        F.col("avail_tokens") > 0,
        F.pow(F.col("avail_tokens").cast("double"), F.lit(float(tau))),
    ).otherwise(F.lit(0.0))
    weight = F.round(y / F.sum(y).over(w_all), 9)
    desired = F.floor(
        F.lit(int(budget_tokens)).cast("double") * weight
    ).cast("bigint")
    planned = F.least(desired, F.col("avail_tokens"))
    return (
        avail.withColumn("weight", weight)
        .withColumn("desired_tokens", desired)
        .select(
            "source",
            "n_docs",
            "avail_tokens",
            "weight",
            "desired_tokens",
            F.when(
                F.col("avail_tokens") > 0,
                F.least(
                    F.lit(1.0),
                    F.col("desired_tokens").cast("double")
                    / F.col("avail_tokens").cast("double"),
                ),
            ).otherwise(F.lit(0.0)).alias("rate"),
            planned.alias("planned_tokens"),
            F.greatest(
                F.col("desired_tokens") - F.col("avail_tokens"),
                F.lit(0).cast("bigint"),
            ).alias("deficit_tokens"),
        )
    )
