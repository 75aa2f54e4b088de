"""Fixed-state frequency sketches: count-min (Cormode & Muthukrishnan,
"An Improved Data Stream Summary: The Count-Min Sketch and its
Applications", J. Algorithms 2005) built as ONE partial-combined
aggregate.

Why this matters at 100 TB: an exact per-key frequency table over a
high-cardinality column (URLs, n-grams, user ids) shuffles one row per
DISTINCT key — billions of rows of shuffle just to answer "which keys
are hot?". The count-min grid is ``depth × width`` counters TOTAL,
regardless of cardinality: every task partial-aggregates its slice into
the fixed grid map-side (Catalyst HashAggregate, ≤ depth·width groups),
and the shuffle moves at most ``depth · width · tasks`` partial rows —
constant in the data size. Estimates only ever OVER-count (collisions
add), with the classic ε = e/width, δ = e^-depth guarantee.

Hash families (the minhash/DOULION pattern):

- ``'portable'`` — md5-derived 31-bit row hash (``base_hash_31``) of
  ``"j:key"``: bit-replicable in any engine, so sketch contents AND
  estimates carry full value oracles.
- ``'fast'`` — ``xxhash64(key, j)``: one codegen'd JVM hash per
  (row, j), no string concat; engine-internal (rows-only checkable).

Both are deterministic — no RNG, reruns build the identical grid, and
two sketches with the same (width, depth, family) merge by cell-wise
addition (``merge_sketches``), the same partial-state algebra as
``agg_state``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pangool_spark.operators.dedup import base_hash_31


def _bucket(key_col, j: int, width: int, hash_family: str):
    if hash_family == "fast":
        return F.pmod(F.xxhash64(key_col, F.lit(j)), F.lit(width))
    return base_hash_31(F.concat_ws(":", F.lit(str(j)), key_col)) % width


def _check_params(width: int, depth: int, hash_family: str) -> None:
    if width < 1 or depth < 1:
        raise ValueError(f"width and depth must be >= 1, got {width}×{depth}")
    if hash_family not in ("fast", "portable"):
        raise ValueError(f"unknown hash_family {hash_family!r}: fast|portable")


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    hash_family: str = "portable",
) -> DataFrame:
    """Build the count-min grid over ``key_col`` (one increment per row;
    pre-aggregate upstream if rows carry counts). Output: (j, bucket, n)
    — at most ``depth × width`` rows, absent cells are zero.

    Plan shape: the per-row ``depth``-way fan-out is a generated array
    explode (no shuffle), then ONE partial-combined aggregate whose
    group count is capped at depth·width — the map-side combine does
    almost all the work; the exchange is tiny and constant-size.
    """
    _check_params(width, depth, hash_family)
    key = F.col(key_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(key, j, width, hash_family).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__e__")
    ).select("__e__.j", "__e__.bucket")
    return cells.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def merge_sketches(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two grids built with the SAME (width, depth,
    hash_family) — the incremental-maintenance path: sketch today's
    batch, merge with the standing sketch, never rescan history."""
    return (
        a.unionByName(b)
        .groupBy("j", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    hash_family: str = "portable",
) -> DataFrame:
    """Point-query the grid for every key in ``keys``: estimate =
    min over the ``depth`` rows of the addressed counters (missing cell
    = 0). Never under-counts the true frequency.

    The probe relation is expected to be small (the candidate/watchlist
    side); it fans out ``depth`` rows per key and joins the ≤
    depth·width-row sketch — broadcast-sized by construction, so the
    join is an exchange-free broadcast probe.
    """
    _check_params(width, depth, hash_family)
    key = F.col(key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(key, j, width, hash_family).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__e__"),
    ).select(key_col, "__e__.j", "__e__.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    width: int = 8192,
    depth: int = 4,
    hash_family: str = "fast",
) -> DataFrame:
    """Keys whose estimated frequency ≥ ``threshold`` with EXACT counts
    for the survivors — the two-pass hot-key report: pass 1 builds the
    constant-size grid, pass 2 re-streams the data through the broadcast
    grid's min-of-counters filter (a map-side prune — only rows whose
    estimate clears the threshold reach the exact count), so the exact
    groupBy shuffles only the plausible-hot slice, never full
    cardinality. CMS never under-counts, so no true heavy hitter is
    pruned (one-sided error: the exact count removes false positives).

    Output: (key, n) with n the EXACT count, n ≥ threshold.
    """
    _check_params(width, depth, hash_family)
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    sketch = count_min_sketch(df, key_col, width, depth, hash_family)
    # pivot the grid to one row per j: bucket-indexed counter array
    rows = (
        sketch.groupBy("j")
        .agg(F.map_from_arrays(F.collect_list("bucket"), F.collect_list("n")).alias("m"))
        .groupBy()
        .agg(F.map_from_arrays(F.collect_list("j"), F.collect_list("m")).alias("grid"))
    )
    key = F.col(key_col)
    counters = [
        F.coalesce(
            F.element_at(
                F.element_at(F.col("grid"), F.lit(j)),
                _bucket(key, j, width, hash_family).cast("bigint"),
            ),
            F.lit(0).cast("long"),
        )
        for j in range(depth)
    ]
    est = F.least(*counters) if depth > 1 else counters[0]
    pruned = df.crossJoin(F.broadcast(rows)).filter(est >= threshold)
    return (
        pruned.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )


def ams_f2(
    df: DataFrame,
    key_col: str,
    n_counters: int = 64,
    n_groups: int = 4,
) -> DataFrame:
    """AMS (Alon–Matias–Szegedy) F2 sketch — estimate the second frequency
    moment F2 = Σᵢ fᵢ² (equivalently the SELF-JOIN SIZE of the key column,
    the cardinality a query optimizer needs before picking a join
    strategy) in one pass with ``n_counters`` integers of state:

        zⱼ = Σᵢ sⱼ(i)·fᵢ   (sⱼ = ±1 per key),   E[zⱼ²] = F2.

    Median-of-means: counters split into ``n_groups`` groups; the
    estimate is the lower median of the group means of zⱼ² (selection,
    not interpolation — engine-exact). Signs come from the 128-bit md5
    of the key (bit j of the digest), so the sketch is deterministic and
    value-oracle-able; md5 bits are not 4-wise independent in theory but
    behave so in practice — swap a tabulation family for proofs.

    Shape: ALL ``n_counters`` sums run inside ONE partial-combined
    aggregate over one scan (64 agg expressions, no explode — the naive
    explode-by-j plan multiplies the input ×64 before the shuffle).
    Constant state per partition, mergeable, any scale.

    Output: one row (n_counters, est_f2, exact_f2, rel_err) — exact F2
    computed alongside from the key-frequency aggregate for the error
    report (drop it at 100 TB if the exact pass is the thing you're
    avoiding; the estimate path never needs it).
    """
    if n_counters % n_groups != 0:
        raise ValueError(
            f"n_counters ({n_counters}) must divide into n_groups "
            f"({n_groups})"
        )
    if n_counters % 4 != 0 or n_counters > 128:
        raise ValueError(
            f"n_counters must be a multiple of 4 and <= 128 (md5 bits), "
            f"got {n_counters}"
        )
    h = F.md5(F.col(key_col).cast("string"))
    signs = []
    for j in range(n_counters):
        c, b = j // 4, j % 4
        v = F.conv(F.substring(h, c + 1, 1), 16, 10).cast("int")
        signs.append(
            F.when(v.bitwiseAND(F.lit(1 << b)) != 0, F.lit(1)).otherwise(
                F.lit(-1)
            )
        )
    z = df.agg(
        *[
            F.sum(s.cast("bigint")).alias(f"__z{j}__")
            for j, s in enumerate(signs)
        ]
    )
    per_group = n_counters // n_groups
    means = []
    for g in range(n_groups):
        sq = None
        for j in range(g * per_group, (g + 1) * per_group):
            t = F.col(f"__z{j}__") * F.col(f"__z{j}__")
            sq = t if sq is None else sq + t
        means.append((sq.cast("double") / F.lit(float(per_group))))
    est = F.array_sort(F.array(*means))[(n_groups + 1) // 2 - 1]
    exact = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__f__"))
        .agg(F.sum(F.col("__f__") * F.col("__f__")).alias("exact_f2"))
    )
    return (
        z.select(
            F.lit(n_counters).alias("n_counters"), est.alias("est_f2")
        )
        .crossJoin(F.broadcast(exact))
        .select(
            "n_counters",
            "est_f2",
            "exact_f2",
            (
                F.abs(F.col("est_f2") - F.col("exact_f2").cast("double"))
                / F.col("exact_f2").cast("double")
            ).alias("rel_err"),
        )
    )


def cms_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min grids built
    with the SAME (width, depth, hash_family): |A JOIN B on k| =
    sum_k f_A(k)*f_B(k), and the sketch estimate is the classic inner
    product min_j sum_bucket a[j][bucket]*b[j][bucket] (Cormode &
    Muthukrishnan 2005, §4.2) — never an under-count, ε·n_a·n_b
    over-count bound at ε = e/width.

    Why it matters at 100 TB: "how big is this join" decides broadcast
    vs shuffle vs salting BEFORE paying for the join; the exact answer
    costs a per-key frequency join (a shuffle of every distinct key),
    the sketch answer costs two constant-size grids that were one
    map-side-combined scan each — and standing sketches merge
    incrementally (``merge_sketches``), so the estimate stays current
    without rescans.

    Inner product in exact decimal(38,0) (BIGINT products can reach
    n_a·n_b per cell), min over the depth rows, emitted as BIGINT
    (fine below ~9e18 — beyond that the join should not be run anyway).
    Missing cells are zero on either side, so the inner join over
    present cells IS the full dot product.

    Output: one row — (est_join_size BIGINT).
    """
    per_j = (
        sketch_a.alias("a")
        .join(
            sketch_b.alias("b"),
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.bucket") == F.col("b.bucket")),
            "inner",
        )
        .groupBy(F.col("a.j"))
        .agg(
            F.sum(
                F.col("a.n").cast("decimal(38,0)")
                * F.col("b.n").cast("decimal(38,0)")
            ).alias("__dot__")
        )
    )
    return per_j.agg(
        F.min("__dot__").cast("bigint").alias("est_join_size")
    )


def histogram_quantile_sketch(
    df: DataFrame,
    value_col: str,
    bin_width: int,
    quantiles: "tuple[float, ...]" = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Quantile estimation from a MERGEABLE equi-width histogram — the
    fixed-state alternative to an exact rank pass, with a HARD error
    bound of one bin width.

    Why this matters at 100 TB: an exact quantile needs the ordered
    cumulative over every distinct value; the histogram needs
    ``range/bin_width`` counters TOTAL, built as one partial-combined
    aggregate (the count-min argument, module docstring) — and two
    histograms with the same width merge by cell-wise addition, so the
    sketch composes across shards, days, and streams the way
    ``merge_sketches`` does. The estimate brackets the true quantile:
    the q-th value lies in ``[bin·w, (bin+1)·w − 1]`` of the first bin
    whose cumulative count reaches ``ceil(q·n)`` — deterministic, no
    probabilistic guarantee needed.

    ``value_col`` must be integer-typed (cents/units); NULL values are
    excluded. The rank target uses the exact lower-quantile definition
    (smallest value whose cumulative count ≥ ceil(q·n)) so it composes
    with an exact verifier. The per-bin cumulative runs as a window
    over the BIN relation (|bins| rows — that bound is the point).

    Output (one row per q): ``q, n, bin, est_lo, est_hi`` with
    ``est_hi − est_lo = bin_width − 1``.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if not quantiles or not all(0.0 < q <= 1.0 for q in quantiles):
        raise ValueError(f"quantiles must be in (0, 1], got {quantiles!r}")
    from pyspark.sql import Window

    vt = dict(df.dtypes).get(value_col)
    if vt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"histogram_quantile_sketch needs an integer value column, "
            f"got {value_col}: {vt!r} — rescale to cents/units"
        )
    w = int(bin_width)
    bins = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.floor(F.col(value_col).cast("bigint") / F.lit(w))
            .cast("bigint")
            .alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return quantiles_from_bins(df.sparkSession, bins, w, quantiles)


def quantiles_from_bins(spark, bins: DataFrame, bin_width: int, quantiles) -> DataFrame:
    """The bracket algebra of ``histogram_quantile_sketch``, exposed over
    an already-built ``(bin, cnt)`` relation so BATCH and STREAMING
    quantiles share one code path (``streaming.ops.stream_quantile_
    sketch`` folds micro-batches into a standing bin relation and calls
    exactly this — stream==batch parity is structural, not re-derived).
    Output (one row per q): ``q, n, bin, est_lo, est_hi``."""
    from pyspark.sql import Window

    w = int(bin_width)
    cum = bins.select(
        "bin",
        F.sum("cnt")
        .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    from pangool_spark.data import local_relation

    qs = local_relation(spark, [(float(q),) for q in quantiles], "q double")
    hit = (
        F.broadcast(qs)
        .join(cum, F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg(F.min("bin").alias("bin"), F.max("n").alias("n"))
    )
    return hit.select(
        "q",
        "n",
        "bin",
        (F.col("bin") * F.lit(w)).alias("est_lo"),
        (F.col("bin") * F.lit(w) + F.lit(w - 1)).alias("est_hi"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, AofA 2007) with a
# PORTABLE register construction: every bit of the sketch derives from
# md5 hex-string algebra (substring / regexp / CASE), so the registers
# AND the estimate replicate verbatim in DuckDB SQL — unlike
# approx_count_distinct, whose engine-internal HLL is rows-only
# checkable. Same portability contract as base_hash_31 / the md5
# MinHash family.


def hll_registers(df: DataFrame, key_col: str, p: int = 10) -> DataFrame:
    """Build the 2^p HyperLogLog registers over ``key_col``. Output:
    ``(j, m_j)`` — at most 2^p rows, absent registers are zero.

    Why this matters at 100 TB: exact COUNT(DISTINCT) shuffles one row
    per distinct key; the HLL state is 2^p counters TOTAL regardless of
    cardinality, built as ONE partial-combined aggregate (the count-min
    argument) — the shuffle moves at most ``2^p · tasks`` partial rows.
    Two register sets with the same p merge by cell-wise MAX
    (``hll_merge``), so sketches compose across shards and days.

    Register construction (one md5 per row, no RNG, rerun-identical):
    ``j`` = the base_hash_31 31-bit value (md5 hex chars 1-8) mod 2^p;
    ``rho`` = 1 + the number of leading zero BITS of the 52-bit word in
    md5 hex chars 9-21, computed by hex-string algebra (leading-zero
    chars via an anchored regexp strip, the partial nibble via a CASE) —
    every step has an exact DuckDB twin. NULL keys are excluded
    (COUNT DISTINCT semantics).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    key = F.col(key_col).cast("string")
    hx = F.md5(key)
    j = (
        F.conv(F.substring(hx, 1, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(0x7FFFFFFF))
        % m
    )
    stripped = F.regexp_replace(F.substring(hx, 9, 13), "^0+", "")
    zchars = F.lit(13) - F.length(stripped)
    nib = F.substring(stripped, 1, 1)
    nib_lz = (
        F.when(nib == "1", 3)
        .when(nib.isin("2", "3"), 2)
        .when(nib.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = (F.lit(4) * zchars + nib_lz + F.lit(1)).cast("int")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(j.alias("j"), rho.alias("rho"))
        .groupBy("j")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Register-wise MAX of two register sets built with the same p —
    the incremental-maintenance path (sketch the new batch, merge with
    the standing registers, never rescan history)."""
    return a.unionByName(b).groupBy("j").agg(F.max("m_j").alias("m_j"))


def hll_estimate(registers: DataFrame, p: int = 10, rho_cap: int = 40) -> DataFrame:
    """Cardinality estimate from HLL registers — one row:
    ``(m, nonzero, v_zero, s_scaled, linear_counting, estimate)``.

    The harmonic sum is EXACT integer algebra: each register contributes
    ``2^(rho_cap − min(m_j, rho_cap))`` (a ≤2^40 BIGINT; absent
    registers contribute 2^rho_cap), so ``s_scaled ≤ 2^(p+rho_cap)``
    stays under 2^53 for p ≤ 13 — both engines convert it to double
    EXACTLY, and the raw estimate ``alpha·m²·2^rho_cap / s_scaled`` is a
    fixed IEEE expression over identical doubles, bit-equal cross-engine.
    Capping rho at ``rho_cap`` biases a register only when it saw ≥ 40
    leading zero bits (probability ~2^-40 per distinct key — never at
    any realistic cardinality). The small-range branch is the standard
    linear counting ``m·ln(m/V)`` when the raw estimate ≤ 2.5m and zero
    registers remain; its single ln is rounded to 9dp like every
    ln-derived output in the catalog.
    """
    if not 4 <= p <= 13:
        raise ValueError(f"p must be in [4, 13] (2^53 exactness), got {p}")
    if rho_cap < 1 or p + rho_cap > 52:
        raise ValueError(f"need p + rho_cap <= 52, got {p}+{rho_cap}")
    m = 1 << p
    term = F.pow(
        F.lit(2.0), F.lit(rho_cap) - F.least(F.col("m_j"), F.lit(rho_cap))
    ).cast("bigint")
    s = registers.agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.coalesce(F.sum(term), F.lit(0)).cast("bigint").alias("__sp__"),
    )
    full = (1 << rho_cap)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_scaled = (
        F.col("__sp__") + (F.lit(m) - F.col("nonzero")) * F.lit(full)
    ).cast("bigint")
    raw = (
        F.lit(alpha)
        * F.lit(float(m) * float(m) * float(full))
        / s_scaled.cast("double")
    )
    v = (F.lit(m) - F.col("nonzero")).cast("bigint")
    lc = F.col("linear_counting")
    return (
        s.select(
            F.lit(m).cast("bigint").alias("m"),
            F.col("nonzero").cast("bigint").alias("nonzero"),
            v.alias("v_zero"),
            s_scaled.alias("s_scaled"),
            ((raw <= F.lit(2.5) * m) & (v > 0)).alias("linear_counting"),
            raw.alias("__raw__"),
        )
        .select(
            "m",
            "nonzero",
            "v_zero",
            "s_scaled",
            "linear_counting",
            F.round(
                F.when(
                    lc, F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero"))
                ).otherwise(F.col("__raw__")),
                9,
            ).alias("estimate"),
        )
    )
