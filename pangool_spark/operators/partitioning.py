"""Partitioning & skew tools (SURVEY §2.8 + 100 TB discipline).

The reference's knobs were ``setCustomPartitionFields`` and the rollup
partition-key narrowing; at 100 TB the two problems that actually hurt are
key skew (one hot key serializes a reducer) and repeated shuffles of the
same join key (no co-location between jobs). These operators are the
engine-level answers:

- ``salted_agg``: two-stage aggregation over a salted key for algebraic
  aggregates — the hot key's rows split across ``n_salts`` partial groups
  before the real grouping. (AQE's skew-join splitting covers joins; this
  covers aggregation skew that partial aggregation alone can't fix, e.g.
  high-cardinality DISTINCT under one hot group.)
- ``write_bucketed`` / ``read_bucketed``: persist a table hash-bucketed by
  its join key so future equi-joins/aggregations on that key run
  shuffle-free (the bucketing metadata lets Catalyst drop the Exchange).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_by: Sequence[str],
    aggs: dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe algebraic aggregation.

    ``aggs`` maps output column → (op, input column) with op in
    {sum, count, min, max}. Stage 1 groups by (keys + salt) computing
    partials; stage 2 merges partials by the real keys (count merges with
    sum). Results are identical to a direct groupBy — pinned by tests —
    while the hot key's stage-1 work spreads over ``n_salts`` tasks.
    """
    merge_op = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_op = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (op, _col) in aggs.items():
        if op not in first_op:
            raise ValueError(f"salted_agg supports {sorted(first_op)}, got {op!r} for {name!r}")

    salted = df.withColumn("__salt__", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*group_by, "__salt__").agg(
        *[first_op[op](c).alias(f"__p_{name}__") for name, (op, c) in aggs.items()]
    )
    return partial.groupBy(*group_by).agg(
        *[merge_op[op](f"__p_{name}__").alias(name) for name, (op, _c) in aggs.items()]
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist hash-bucketed (and optionally sorted) by the join key.

    Joins/aggregations between tables bucketed the same way skip the
    exchange entirely — the co-located-join answer the reference had no
    equivalent for (each MapReduce job re-shuffled).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)


def cluster_by(df: DataFrame, keys: Sequence[str], n_partitions: int | None = None) -> DataFrame:
    """repartition + sortWithinPartitions — the reference's shuffle/sort
    contract as a reusable primitive (CLUSTER BY)."""
    parts = [F.col(k) for k in keys]
    out = df.repartition(n_partitions, *parts) if n_partitions else df.repartition(*parts)
    return out.sortWithinPartitions(*parts)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_keys: Sequence[str],
    n_files: int | None = None,
    mode: str = "error",
) -> None:
    """Write parquet RANGE-CLUSTERED on ``cluster_keys`` so point/range
    scans prune at the FILE and ROW-GROUP level.

    ``repartitionByRange`` gives each output file a disjoint key range,
    and the within-partition sort makes every row group's parquet
    min/max stats a tight, non-overlapping interval — so a filtered read
    skips whole files (footer min/max) and whole row groups before any IO.
    On an unclustered write every file spans the full key range and
    nothing prunes. This is the scan-side complement to
    ``write_bucketed`` (which optimizes the JOIN side): cluster the
    columns you FILTER by, bucket the columns you JOIN by.

    Range boundaries come from Spark's reservoir sampling of the keys, so
    file sizes stay balanced under skew (a hot key concentrates into its
    own range instead of silently bloating one hash bucket).
    """
    keys = [F.col(k) for k in cluster_keys]
    staged = (
        df.repartitionByRange(n_files, *keys)
        if n_files
        else df.repartitionByRange(*keys)
    )
    staged.sortWithinPartitions(*keys).write.mode(mode).parquet(path)


def diagnose_skew(
    df: DataFrame, keys: Sequence[str], top: int = 10
) -> DataFrame:
    """Hot-key report for a prospective shuffle key: the ``top`` heaviest
    key groups with row count and share of total — the question to ask
    BEFORE a groupBy/join ships 100 TB on that key (answers whether you
    need ``salted_agg``, AQE skew-join, or a different key). One
    partial-agg shuffle + a broadcast scalar; deterministic tie-break on
    the key values.

    Output: keys..., n_rows, share (of all rows), rank.

    The top-``top`` selection is a DISTRIBUTED top-k
    (``orderBy(...).limit(top)`` plans TakeOrderedAndProject: each task
    keeps its local top-k, the driver merges heaps) — NOT a global
    ``row_number`` window, which would funnel every distinct key through
    one task: with a high-cardinality key (user_id, url) at 100 TB the
    counts relation is billions of rows, and a single-partition window in
    the skew DIAGNOSER would itself be the straggler. The rank column is
    attached afterwards over the ≤``top`` surviving rows (already one
    sorted partition, so no extra exchange).
    """
    from pyspark.sql import Window

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    # denominator from the aggregate itself (|distinct keys| rows), NOT a
    # second full scan of the input table
    total = counts.agg(F.sum("n_rows").alias("__total__"))
    order = [F.col("n_rows").desc(), *[F.col(k).asc() for k in keys]]
    top_rows = counts.orderBy(*order).limit(top)
    w = Window.orderBy(*order)
    return (
        top_rows.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n_rows") / F.col("__total__"))
        .select(*keys, "n_rows", "share", "rank")
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_mb: int = 128,
    mode: str = "error",
) -> int:
    """Rewrite a parquet dataset into ~``target_mb`` files — the
    small-files maintenance job every long-lived 100 TB table needs
    (footer/open overhead and scheduler pressure scale with FILE COUNT,
    not bytes; streaming sinks and fine-grained partitioning leave
    thousands of KB-sized parts behind).

    File count is computed from the dataset's actual on-disk bytes via the
    Hadoop FileSystem API — so any scheme Spark can read (file://, hdfs://,
    s3a://) works, not just the driver's local disk. When the target is
    FEWER files than the scan's partitions the rewrite uses ``coalesce``
    (narrow — no shuffle: existing partitions concatenate into fewer write
    tasks); when it is MORE (a few huge files being split back toward the
    target size), ``coalesce`` cannot raise partition count, so the
    rewrite falls back to a ``repartition`` shuffle. Returns the number of
    parquet files actually written (counted from ``out_path``, not the
    computed target — empty tasks can write fewer).
    """
    import math

    def _scan(p):
        hpath = spark._jvm.org.apache.hadoop.fs.Path(p)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            raise FileNotFoundError(f"no such path {p}")
        total_bytes, n_parquet = 0, 0
        it = fs.listFiles(hpath, True)
        while it.hasNext():
            status = it.next()
            if status.getPath().getName().endswith(".parquet"):
                total_bytes += status.getLen()
                n_parquet += 1
        return total_bytes, n_parquet

    total_bytes, n_parquet = _scan(path)
    if n_parquet == 0:
        raise FileNotFoundError(f"no parquet files under {path}")
    n_files = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    cur_partitions = df.rdd.getNumPartitions()
    staged = df.coalesce(n_files) if n_files <= cur_partitions else df.repartition(n_files)
    staged.write.mode(mode).parquet(out_path)
    return _scan(out_path)[1]


def zorder_value(
    cols: Sequence[str],
    mins: Sequence[float],
    maxs: Sequence[float],
    bits: int = 16,
) -> Column:
    """Z-order (Morton) key over numeric columns: each value is bucketed
    into ``2^bits`` levels over its [min, max] range, and the bucket bits
    of all columns are interleaved into one LONG. Rows close in EVERY
    dimension get close z-values, so range-clustering by this key gives
    file/row-group pruning on ALL the interleaved columns at once —
    1-D clustering prunes only its leading column (Delta's OPTIMIZE
    ZORDER, as a plain column expression).

    Ranges are caller-supplied (one cheap agg, or known domain bounds):
    the expression stays deterministic and usable in any plan. Bit budget:
    ``bits × len(cols)`` ≤ 63.

    Implementation note: the interleave is nibble-table lookups (each
    4-bit chunk maps through a 16-entry literal map whose values carry
    the chunk's bits spread to stride ``len(cols)``), NOT a per-bit
    shift/or chain. A chain of ``bits × cols`` binary ops over the
    source columns sends Catalyst's constraint propagation
    combinatorial — measured 65s of driver time planning a 16-bit
    2-column key at sf0.1 vs 8s with the shallow lookup tree (values
    identical either way).
    """
    if not cols or len(cols) != len(mins) or len(cols) != len(maxs):
        raise ValueError("cols/mins/maxs must be same nonzero length")
    if bits * len(cols) > 63:
        raise ValueError(f"bits*len(cols) must fit a LONG, got {bits * len(cols)}")
    levels = 1 << bits
    n = len(cols)
    # spread table: nibble v -> bits of v at positions 0, n, 2n, 3n
    spread = [
        sum(((v >> i) & 1) << (i * n) for i in range(4)) for v in range(16)
    ]
    spread_map = F.map_from_arrays(
        F.array(*[F.lit(v) for v in range(16)]),
        F.array(*[F.lit(s).cast("long") for s in spread]),
    )
    parts = []
    for ci, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        span = float(hi) - float(lo)
        if span <= 0:
            continue
        b = F.floor((F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span) * levels)
        b = F.least(F.greatest(b, F.lit(0)), F.lit(levels - 1)).cast("long")
        for m in range((bits + 3) // 4):  # 4-bit chunks, low to high
            nib = F.shiftright(b, 4 * m).bitwiseAND(F.lit(15)).cast("int")
            parts.append(
                F.shiftleft(F.element_at(spread_map, nib), 4 * m * n + ci)
            )
    if not parts:
        return F.lit(0).cast("long")
    z = parts[0]
    for p in parts[1:]:
        z = z.bitwiseOR(p)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    mins: Sequence[float],
    maxs: Sequence[float],
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "error",
) -> None:
    """``write_clustered`` generalized to multiple filter dimensions:
    range-partition + sort on the Morton key so every file covers a small
    HYPER-RECTANGLE of the key space — filters on ANY z-ordered column
    prune files, not just the first."""
    z = zorder_value(cols, mins, maxs, bits).alias("__z__")
    staged = df.withColumn("__z__", z)
    staged = (
        staged.repartitionByRange(n_files, "__z__")
        if n_files
        else staged.repartitionByRange("__z__")
    )
    staged.sortWithinPartitions("__z__").drop("__z__").write.mode(mode).parquet(path)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join — the join-side sibling of ``salted_agg``: a
    hot key (the bot user, the null-ish sentinel id, the top SKU) sends
    ALL its big-side rows to one task in a plain shuffle join; here the
    big side gets a deterministic content-derived salt and the small side
    is replicated ``n_salts``× (explode, not a cross join), so the join
    key becomes (keys + salt) and the hot key's rows spread over
    ``n_salts`` tasks. Each big row matches exactly one replica → the
    result EQUALS ``big.join(small, on, how)`` (pinned by test + oracle).

    Use when AQE's skew-join split doesn't apply (it only splits
    sort-merge partitions, not e.g. a shuffled hash join's build side)
    or when the skew is known ahead of time. Cost: small side ×n_salts
    (keep it the DIMENSION side), big side +4 bytes of salt.

    ``how``: ``inner``/``left`` (both keep exactly one match per
    matching (big row, small row) pair; ``left`` keeps unmatched big
    rows with nulls — replication cannot duplicate them because a big
    row carries ONE salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    keys = list(on)
    for side, cols in (("big", big.columns), ("small", small.columns)):
        if "__salt__" in cols:
            raise ValueError(
                f"salted_join: the {side} side already has a __salt__ "
                "column — rename it first (withColumn would silently "
                "replace it / corrupt the join keys)"
            )
    # deterministic salt from the whole row's hash: stable across
    # retries/repartitions (F.rand re-rolls per task attempt — fine for
    # salted_agg's partial sums, wrong for join row identity)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("__salt__", salt)
    s = small.withColumn(
        "__salt__",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    return b.join(s, keys + ["__salt__"], how).drop("__salt__")


def stable_row_ids(
    df: DataFrame,
    order_by: Sequence[str],
    id_col: str = "row_id",
    n_buckets: int | None = None,
    sample_per_bucket: int = 128,
) -> DataFrame:
    """Dense global row numbers 1..N under a total order — WITHOUT the
    single-partition ``row_number() OVER (ORDER BY …)`` window, which
    serializes the entire dataset through one task (the canonical
    100 TB anti-pattern; the reference got stable positions for free
    from the MR sort phase, e.g. its sorted TupleFile outputs).

    Sample-sort ranking (the TeraSort lineage), with every step a PURE
    FUNCTION of the row so re-executed jobs can never disagree:

    1. bound literals: a deterministic content-hash sample of the first
       order column (``hash_sample`` semantics — rerun-stable), sorted
       once on the driver (bounded: ``n_buckets · sample_per_bucket``
       values), quantile positions picked as ``n_buckets − 1`` bounds;
    2. ``bucket(row) = #bounds ≤ key`` — a fixed broadcast-literal
       expression, NOT an exchange's runtime boundary sampling
       (``repartitionByRange`` re-samples with RDD-id-derived seeds, so
       two jobs over it can legitimately see different partition ids —
       measured flaky before this design);
    3. local rank: ``row_number`` per BUCKET (≈ equal-sized groups
       spread across tasks — never one global window partition);
    4. per-bucket counts (column-pruned scan of the first key only)
       → cumulative offsets on the driver (≤ ``n_buckets`` rows, the
       repo's bounded-collect contract) → a map-literal lookup column
       (no join at all); ``row_id = offset(bucket) + local_rank``.

    Ids are dense 1..N always, and deterministic iff ``order_by`` is a
    total order (unique key); ties get arbitrary-but-dense ids. NULL
    keys bucket/sort first (Spark default). Skew caveat: bucketing uses
    the FIRST order column only, so one hot first-key value bounds a
    single window group — correctness holds, parallelism degrades.
    """
    keys = _validate_order(df, order_by, id_col, "stable_row_ids")
    m = _bucketed(df, keys, n_buckets, sample_per_bucket)
    from pyspark.sql import Window

    off = _bucket_offsets(m, F.count(F.lit(1)))
    w = Window.partitionBy("__bkt__").orderBy(*keys)
    return m.select((off + F.row_number().over(w)).alias(id_col), *df.columns)


def _validate_order(df, order_by, out_col, name) -> list:
    keys = list(order_by)
    if not keys:
        raise ValueError(f"{name} needs at least one order column")
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"order_by columns not in input: {missing}")
    if out_col in df.columns:
        raise ValueError(f"input already has a {out_col!r} column")
    return keys


def _bucketed(
    df: DataFrame,
    keys: Sequence[str],
    n_buckets: int | None,
    sample_per_bucket: int,
) -> DataFrame:
    """Sample-sort bucketing: deterministic content-hash ROW sample →
    driver-sorted bound literals over the first order column →
    ``__bkt__`` as a PURE row function (never an exchange's runtime
    boundary sampling, which is RDD-id-seeded and not re-execution-
    stable — measured).

    The sample hashes the FULL order-key tuple, not ``keys[0]`` alone
    (round-11 fix): hashing only the first key selects VALUES, so a
    low-cardinality leading key defeats the rate arithmetic — at the
    100× zorder probe, 100 distinct Morton codes × a 69/10⁶ keep-rate
    meant the sample was EMPTY with p≈0.993, bounds collapsed, every
    row landed in bucket 0, and Catalyst folded the literal partition
    key into an UNPARTITIONED window (a single task walking all 60M
    rows — measured 470s). ``order_by`` is a total order, so the
    composite hash is row-uniform whatever the leading key's
    cardinality; bounds stay frequency-weighted quantiles of
    ``keys[0]``, so bucket assignment remains a contiguous-range
    function of the total order and downstream prefix sums / row ids
    are value-identical either way.

    The sample hash is ``xxhash64`` on the raw key columns, NOT the
    portable md5 ladder: bucket bounds never reach any output value
    (prefix sums are exact integers, ids are ranks of a total order),
    so the hash only needs rerun-stability — which any content hash
    gives — and the md5 ladder cost a measured 0.6-0.8 s per sampling
    pass at sf0.1 vs 0.2 s for the codegen'd xxhash64 (no string
    casts, no concat, no md5 rounds). Engine-portable hashing stays
    where the hash DECIDES results (sampling operators)."""
    from pangool_spark.operators.sampling import _BUCKETS

    n = int(n_buckets or df.sparkSession.sparkContext.defaultParallelism)
    if n <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    k0 = F.col(keys[0])
    total = df.count()
    target = n * sample_per_bucket
    if total > target:
        sample = df.filter(
            F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(_BUCKETS))
            < int(target / total * _BUCKETS) + 1
        )
    else:
        sample = df
    vals = sorted(
        r[0] for r in sample.select(k0).filter(k0.isNotNull()).collect()
    )
    bounds = sorted(
        {vals[int(len(vals) * i / n)] for i in range(1, n)}
    ) if vals else []
    if bounds:
        # bucket = #bounds <= k0, as a codegen'd CASE WHEN chain over the
        # sorted bound literals (first bound STRICTLY greater picks the
        # index). The former array-fold (F.aggregate over a literal
        # array) is an interpreted HigherOrderFunction — measured ~1 s
        # per 600k-row pass at sf0.1 vs noise for the WHEN chain. NULL
        # keys bucket first (Spark sort default), as before.
        bucket = F.when(k0.isNull(), F.lit(0))
        for i, b in enumerate(bounds):
            bucket = bucket.when(k0 < F.lit(b), F.lit(i))
        bucket = bucket.otherwise(F.lit(len(bounds)))
    else:
        bucket = F.lit(0)
    return df.withColumn("__bkt__", bucket)


def _bucket_offsets_multi(m: DataFrame, agg_exprs):
    """Cumulative EXCLUSIVE per-bucket totals for SEVERAL aggregates in
    ONE collect (≤ n_buckets driver rows, the bounded-collect contract),
    each returned as a map-literal lookup COLUMN over ``__bkt__``. A
    literal expression instead of a broadcast-join relation: one fewer
    join in every consumer, and no LocalRelation in the plan — joining
    the offsets relation back in tripped an internal Catalyst binding
    error (ATTRIBUTE_NOT_FOUND) whenever an unrelated same-named local
    relation existed in the session (Spark 4.1.2, small-universe path;
    measured)."""
    rows = m.groupBy("__bkt__").agg(
        *[e.alias(f"__s{i}__") for i, e in enumerate(agg_exprs)]
    ).collect()
    out = []
    for i in range(len(agg_exprs)):
        sums = sorted((r["__bkt__"], r[f"__s{i}__"]) for r in rows)
        offsets, acc = [], 0
        for bkt, s in sums:
            offsets.append((bkt, acc))
            acc += s if s is not None else 0
        if not offsets:
            out.append(F.lit(0).cast("long"))
            continue
        lookup = F.map_from_arrays(
            F.array(*[F.lit(int(b)) for b, _ in offsets]),
            F.array(*[F.lit(int(o)).cast("long") for _, o in offsets]),
        )
        out.append(F.element_at(lookup, F.col("__bkt__")))
    return out


def _bucket_offsets(m: DataFrame, agg_expr):
    return _bucket_offsets_multi(m, [agg_expr])[0]


def global_running_sum(
    df: DataFrame,
    order_by: Sequence[str],
    value_col: "str | Sequence[str]",
    out_col: "str | Sequence[str]" = "running_total",
    n_buckets: int | None = None,
    sample_per_bucket: int = 128,
) -> DataFrame:
    """Global running (prefix) sum of an integer column under a total
    order — ``SUM(v) OVER (ORDER BY …)`` semantics WITHOUT the
    single-partition window: the distributed prefix-sum primitive
    behind cumulative dashboards, Pareto/ABC analyses, and systematic
    weighted sampling over cumulative-weight space.

    Same sample-sort shape as ``stable_row_ids`` (shared helpers): the
    per-bucket local cumsum is a bucket-partitioned window, the
    cross-bucket carry is the exclusive cumulative of per-bucket SUMS
    (≤ n_buckets rows on the driver). Requires an integer-typed value
    (exact, order-independent partials — doubles would make the carry
    depend on the bucketing); NULL values add 0. Deterministic iff
    ``order_by`` is a total order.

    ``value_col``/``out_col`` may be parallel LISTS: every prefix sum
    then shares ONE bucketing pass and ONE offsets collect (same bucket
    bounds for all columns — the sums are exact integers, so the output
    values are identical to n separate calls, at 1/n the action count).

    Output: input columns + each ``out_col`` (BIGINT).
    """
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    ocols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(vcols) != len(ocols):
        raise ValueError(
            f"global_running_sum: {len(vcols)} value columns but "
            f"{len(ocols)} output names"
        )
    keys = list(order_by)
    for oc in ocols:
        keys = _validate_order(df, order_by, oc, "global_running_sum")
    types = dict(df.dtypes)
    for vc in vcols:
        vt = types.get(vc)
        if vt not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"global_running_sum needs an integer value column (exact "
                f"carry), got {vc}: {vt} — rescale to cents/micros"
            )
    m = _bucketed(df, keys, n_buckets, sample_per_bucket)
    from pyspark.sql import Window

    offs = _bucket_offsets_multi(
        m, [F.sum(F.col(vc).cast("bigint")) for vc in vcols]
    )
    w = (
        Window.partitionBy("__bkt__")
        .orderBy(*keys)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    outs = []
    for vc, oc, off in zip(vcols, ocols, offs):
        local = F.sum(F.coalesce(F.col(vc).cast("bigint"), F.lit(0))).over(w)
        outs.append((off + local).alias(oc))
    return m.select(*df.columns, *outs)


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_buckets: int | None = None,
    sample_per_bucket: int = 128,
) -> DataFrame:
    """2-D Pareto frontier (skyline): the rows no other row dominates,
    where b dominates a iff b.x >= a.x AND b.y >= a.y AND b is strictly
    greater in at least one — the "best trade-off" preference query
    (price vs quality, latency vs recall). Both columns are MAXIMIZED;
    pass a negated expression to minimize one. Exact duplicates of a
    frontier point all survive; rows with a NULL coordinate neither
    join nor dominate (filtered out, SQL comparison semantics).

    Textbook skylines sort once and sweep — a single-partition global
    window, the canonical 100 TB anti-pattern. This is the sample-sort
    restatement (the ``global_running_sum`` machinery): survivors are
    exactly the rows with ``y == E(x)`` and ``y > M(x)``, where E(x) =
    max y at the same x (one aggregate) and M(x) = max y over all
    strictly-greater x — an exclusive SUFFIX max computed as
    per-x-bucket windows plus a driver-side cross-bucket carry
    (≤ n_buckets values, map-literal lookup, no global window, no
    join for the carry). One shuffle for E, one for the bucket window,
    one semi-join back.
    """
    from pyspark.sql import Window

    keys = [x_col]
    x, y = F.col(x_col), F.col(y_col)
    clean = df.filter(x.isNotNull() & y.isNotNull())
    agg = clean.groupBy(x_col).agg(F.max(y_col).alias("__e__"))
    m = _bucketed(agg, keys, n_buckets, sample_per_bucket)
    # cross-bucket carry: exclusive suffix max of per-bucket max(E),
    # walking buckets top-down on the driver (bounded collect)
    per_bucket = sorted(
        (
            (r["__bkt__"], r["s"])
            for r in m.groupBy("__bkt__")
            .agg(F.max("__e__").alias("s"))
            .collect()
        ),
        reverse=True,
    )
    carry: dict[int, object] = {}
    acc = None
    for bkt, s in per_bucket:
        carry[bkt] = acc
        if s is not None and (acc is None or s > acc):
            acc = s
    with_carry = {b: c for b, c in carry.items() if c is not None}
    if with_carry:
        lookup = F.element_at(
            F.map_from_arrays(
                F.array(*[F.lit(int(b)) for b in with_carry]),
                F.array(*[F.lit(c) for c in with_carry.values()]),
            ),
            F.col("__bkt__"),
        )
    else:
        lookup = F.lit(None)
    # within-bucket exclusive suffix max over x DESC (x is unique in the
    # aggregated relation, so equal-x leakage into the window is
    # impossible); F.greatest skips NULLs, so the top bucket's missing
    # carry and the first row's empty window both behave
    w = (
        Window.partitionBy("__bkt__")
        .orderBy(F.col(x_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    suffix = F.greatest(F.max("__e__").over(w), lookup)
    sky = (
        m.withColumn("__m__", suffix)
        .filter(F.col("__m__").isNull() | (F.col("__e__") > F.col("__m__")))
        .select(x_col, "__e__")
    )
    return clean.join(
        sky,
        (clean[x_col] == sky[x_col]) & (clean[y_col] == sky["__e__"]),
        "left_semi",
    )


def range_partition_plan(
    df: DataFrame,
    value_col: str,
    num_partitions: int = 8,
    bin_width: int = 1,
) -> DataFrame:
    """Range-partitioner planning: EXACT balanced cut points over
    ``value_col`` and the per-bucket balance report — what
    ``RangePartitioner`` does with a sample, done exactly, for the
    layouts where "roughly balanced" isn't enough (sort-merge bucketing,
    global-sort file layout, shard sizing). Cut ``i`` is the exact
    lower-quantile at ``i/num_partitions`` (smallest value whose
    cumulative count ≥ ceil(q·n) — the ``histogram_quantile_sketch``
    definition); bucket(v) = #cuts < v, so ties land LOW and duplicate
    cuts surface as empty buckets (unsplittable skew made visible
    instead of papered over).

    The 100 TB shape: three linear scans of the rows (bin histogram,
    candidate-bin local rank, final bucket count) and only
    aggregate-sized shuffles. The exact refinement uses the histogram AS
    THE PARTITIONER (the two-phase classic, cf.
    ``histogram_quantiles_lineitem``): the true cut provably lies in the
    sketch's chosen bin, so only rows of ≤ num_partitions−1 candidate
    bins get a local rank — never a global prefix pass over all distinct
    values. The num_partitions−1 cut values are collected to the driver
    (bounded by construction, ≤ 1024) to build the codegen'd bucket
    expression — exactly what a real range partitioner broadcasts.

    ``value_col`` must be integer-typed (cents/units). NULL values are
    excluded. Output: one row per non-empty bucket —
    (bucket, n_rows, frac, lo, hi) with lo/hi the observed min/max.
    """
    vt = dict(df.dtypes).get(value_col)
    if vt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"range_partition_plan needs an integer value column, got "
            f"{value_col}: {vt!r} — rescale to cents/units"
        )
    c = F.col(value_col).cast("bigint")
    rows = df.filter(c.isNotNull()).select(c.alias("__c__"))
    cut_vals = exact_quantile_cuts(rows, "__c__", num_partitions, bin_width)
    bucket = F.lit(0)
    for cv in cut_vals:
        bucket = bucket + F.when(F.col("__c__") > F.lit(cv), 1).otherwise(0)
    total = rows.agg(F.count(F.lit(1)).alias("__n__"))
    return (
        rows.select(bucket.cast("bigint").alias("bucket"), "__c__")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__c__").alias("lo"),
            F.max("__c__").alias("hi"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("__n__").cast("double"))
            .alias("frac"),
            "lo",
            "hi",
        )
    )


def exact_quantile_cuts(
    df: DataFrame,
    value_col: str,
    num_partitions: int,
    bin_width: int = 1,
) -> "list[int]":
    """The k−1 EXACT lower-quantile cut values at i/k over an integer
    column, refined two-phase (bin histogram as the partitioner — the
    ``range_partition_plan`` engine, exposed for any operator that needs
    a value-balanced bucketing: uplift deciles, shard sizing, equi-depth
    layout). Returns the SORTED python list (≤ 1023 scalars — the
    partitioner-broadcast contract); duplicates mean unsplittable skew
    at that quantile. Two linear scans, aggregate-sized shuffles only.
    """
    from pyspark.sql import Window

    from pangool_spark.operators.sketch import quantiles_from_bins

    k = int(num_partitions)
    if not 2 <= k <= 1024:
        raise ValueError(f"num_partitions must be in [2, 1024], got {k}")
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    vt = dict(df.dtypes).get(value_col)
    if vt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"exact_quantile_cuts needs an integer value column, got "
            f"{value_col}: {vt!r} — rescale to cents/units"
        )
    w = int(bin_width)
    rows = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("bigint").alias("__c__")
    )
    qs = tuple(i / k for i in range(1, k))
    # phase 1: |bins|-sized histogram, checkpointed (one row scan, and
    # brackets/cum bases both derive from it without a rescan)
    bins = (
        rows.groupBy(
            F.floor(F.col("__c__") / F.lit(w)).cast("bigint").alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    sk = quantiles_from_bins(df.sparkSession, bins, w, qs)
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin", (F.sum("cnt").over(wcum) - F.col("cnt")).alias("__base__")
    )
    targets = sk.join(cum, "bin").select(
        "q",
        "bin",
        "__base__",
        F.ceil(F.col("q") * F.col("n")).alias("__r__"),
    )
    # phase 2: local rank inside candidate bins only (second row scan,
    # broadcast-pruned map-side)
    in_bin = rows.withColumn(
        "bin", F.floor(F.col("__c__") / F.lit(w)).cast("bigint")
    ).join(F.broadcast(targets), "bin")
    per_val = in_bin.groupBy("q", "__base__", "__r__", "__c__").agg(
        F.count(F.lit(1)).alias("__lc__")
    )
    wloc = Window.partitionBy("q").orderBy("__c__").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cuts_df = (
        per_val.withColumn(
            "__cum__", F.col("__base__") + F.sum("__lc__").over(wloc)
        )
        .filter(F.col("__cum__") >= F.col("__r__"))
        .groupBy("q")
        .agg(F.min("__c__").alias("cut"))
    )
    return sorted(int(r["cut"]) for r in cuts_df.collect())
