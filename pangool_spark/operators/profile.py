"""Data-quality profiling: per-column stats in ONE pass over the table.

The pipeline-health primitive (Deequ / Great Expectations territory) the
reference never had — at 100 TB you profile before you process, and the
profile must not cost N scans for N columns.

Shape: one ``agg`` computes every column's count / nulls / exact distinct /
min / max simultaneously — Catalyst compiles the multiple exact
COUNT(DISTINCT) into a single Expand + two-level aggregate, so the table is
READ ONCE regardless of column count (the Expand multiplies rows ×|cols|
in-memory, the standard cost of simultaneous exact NDVs; swap in
``approx_count_distinct`` via ``exact=False`` when a 2% NDV error is
acceptable at scale — that keeps the plan Expand-free). The single result
row is then unpivoted driver-side-free via ``stack`` into one row per
column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, cols: Sequence[str] | None = None, exact: bool = True
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, n_distinct, min, max).

    min/max are stringified so heterogeneous column types share one output
    schema; NDV is exact by default (``exact=False`` → HLL sketch, no
    Expand). Nulls are excluded from NDV/min/max, matching SQL semantics.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("column_profile needs at least one column")
    ndv = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__cnt_{c}__"),
            ndv(F.col(c)).alias(f"__ndv_{c}__"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}__"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}__"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n__ - __cnt_{c}__, __ndv_{c}__, __min_{c}__, __max_{c}__"
        for c in cols
    )
    return one.selectExpr(
        "__n__ AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (column, n_null, n_distinct, min, max)",
    ).select("column", "n_rows", "n_null", "n_distinct", "min", "max")


def dataset_checksum(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Order-insensitive dataset fingerprint: (n_rows, checksum) where
    checksum = sum of per-row xxhash64 over the selected columns (as a
    38-digit decimal, so 10^10 rows of 64-bit hashes cannot wrap). Two
    DataFrames with equal multisets of rows produce equal checksums
    regardless of row order, partitioning, or cluster size — the cheap
    "did the rerun produce the same dataset?" answer that comparing 100 TB
    sorted outputs cannot give. One scan, one scalar aggregate; no sort,
    no shuffle of data rows (map-side partial sums).

    Engine-internal by design (xxhash64): use it to compare Spark runs
    with each other, not against other engines. A multiset DIFFERENCE
    that sums to zero by collision needs adversarial rows (~2⁻⁶⁴ by
    chance). Null handling: Spark's xxhash64 SKIPS null arguments (the
    seed passes through unchanged), which would make ('a', NULL) and
    (NULL, 'a') collide — so each column is interleaved with its
    null-indicator boolean, making null POSITION part of the hash while
    keeping it a single JVM expression. Column ORDER matters (pass
    ``cols`` explicitly when schemas may have drifted).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("dataset_checksum needs at least one column")
    hashed = [x for c in cols for x in (F.col(c), F.col(c).isNull())]
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.xxhash64(*hashed).cast("decimal(38,0)")).alias("checksum"),
    )


def expectations(df: DataFrame, constraints: dict) -> DataFrame:
    """Data-quality gate: evaluate named row-level constraints (SQL
    boolean expressions) in ONE pass and report per-constraint violation
    counts — the "fail the pipeline if >0.1% of rows are bad" primitive.
    NULL predicate results count as violations (a constraint that cannot
    be proven true is not satisfied — SQL CHECK semantics inverted for
    safety).

    One aggregate, zero shuffles beyond its scalar merge: every
    constraint becomes a conditional SUM over the same scan, so N checks
    cost one table read, not N. Output: (constraint_name, n_rows,
    n_violations, pass_fraction) — one row per constraint, stack-unpivoted like
    ``column_profile``.
    """
    if not constraints:
        raise ValueError("expectations needs at least one constraint")
    aggs = [F.count(F.lit(1)).alias("__n__")]
    names = list(constraints)
    for i, (_name, pred) in enumerate(constraints.items()):
        ok = F.coalesce(F.expr(pred).cast("boolean"), F.lit(False))
        aggs.append(
            F.sum(F.when(ok, 0).otherwise(1)).alias(f"__viol_{i}__")
        )
    one = df.agg(*aggs)
    quoted = [n.replace("'", "''") for n in names]
    stack_args = ", ".join(
        f"'{q}', __viol_{i}__" for i, q in enumerate(quoted)
    )
    return one.selectExpr(
        "__n__ AS n_rows",
        f"stack({len(names)}, {stack_args}) AS (constraint_name, n_violations)",
    ).select(
        "constraint_name",
        "n_rows",
        "n_violations",
        (1.0 - F.col("n_violations") / F.col("n_rows")).alias("pass_fraction"),
    )


def grouped_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Fixed-width histogram (optionally per group) in one aggregate:
    ``bin = floor((y − lo) / w)``, rows outside ``[lo, hi)`` dropped,
    counts per (group, bin). Empty bins are absent (sparse output — at
    100 TB a dense bin spine per group is the caller's explode).

    Engine parity: the bin index is a floor of a fixed double expression
    (oracles mirror it with CAST(FLOOR(...) AS BIGINT) — DuckDB's bare
    int cast ROUNDS, the r05 lesson) and ``bin_lo = lo + bin·w`` is two
    exact-rounded ops off integers, so edges hash-match too.

    Output: (*group_cols, bin, bin_lo, n).
    """
    if not n_bins > 0:
        raise ValueError(f"n_bins must be positive, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    w = (float(hi) - float(lo)) / int(n_bins)
    y = F.col(value_col).cast("double")
    b = F.floor((y - F.lit(float(lo))) / F.lit(w)).cast("bigint")
    return (
        df.filter(y.isNotNull() & (y >= float(lo)) & (y < float(hi)))
        .groupBy(*group_cols, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *group_cols,
            "bin",
            (F.lit(float(lo)) + F.col("bin").cast("double") * F.lit(w)).alias(
                "bin_lo"
            ),
            "n",
        )
    )


def category_drift(
    ref: DataFrame,
    cur: DataFrame,
    cat_col: str,
) -> DataFrame:
    """Categorical-distribution drift between a reference snapshot and a
    current one, as per-category Pearson chi-squared terms — the "did
    yesterday's pipeline change the language / source / label mix"
    monitor. Two count aggregates + one full-outer join on the category;
    no sorts, no windows; the category relation is one row per distinct
    value (broadcast-sized in practice, AQE picks it).

    chi2_term = (observed − expected)² / expected with expected =
    n_cur · ref_share — a fixed chain of exact-rounded double ops off
    integer counts, so every output value hash-matches cross-engine
    (no ln/exp anywhere — unlike KL divergence, which is libm-divergent;
    this is why the drift statistic here is chi-squared).

    Categories absent from the reference get NULL chi2_term (expected =
    0 — a NEW category is a schema-level alarm, not a number); absent
    from current get observed = 0 and a real term. Output:
    (category, n_ref, n_cur, expected, chi2_term).
    """
    a = ref.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    b = cur.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    joined = (
        a.join(b, "category", "full_outer")
        .select(
            "category",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .crossJoin(
            F.broadcast(
                a.agg(F.sum("n_ref").cast("double").alias("__ta__")).crossJoin(
                    b.agg(F.sum("n_cur").cast("double").alias("__tb__"))
                )
            )
        )
    )
    e = F.col("__tb__") * (F.col("n_ref").cast("double") / F.col("__ta__"))
    o = F.col("n_cur").cast("double")
    term = F.when(F.col("n_ref") > 0, (o - e) * (o - e) / e)
    return joined.select(
        "category",
        "n_ref",
        "n_cur",
        F.when(F.col("n_ref") > 0, e).alias("expected"),
        term.alias("chi2_term"),
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Equi-depth (quantile) histogram: bins hold ~equal ROW counts
    instead of equal width — the robust profile for heavy-tailed
    columns where ``grouped_histogram`` would put 99% of rows in one
    bucket (and exactly what a range-partitioner or an optimizer
    cardinality model wants). One exact-percentile-ARRAY aggregate
    (Spark evaluates all edges in a single pass per group) + one
    join + one count aggregate.

    Rows land in bin i when ``edge[i] ≤ y < edge[i+1]`` (last bin
    closed). Counts are ~equal, not exact, when values repeat —
    duplicates cannot straddle an edge. Edges ride the
    percentile==quantile_cont bit-parity, so bin edges AND counts are
    fully value-oracle-able.

    Output: (*group_cols, bin, lo, hi, n).
    """
    if n_bins <= 0:
        raise ValueError(f"n_bins must be positive, got {n_bins}")
    qs = [i / n_bins for i in range(n_bins + 1)]
    y = F.col(value_col).cast("double")
    aggs = [
        F.percentile(y, F.lit(q)).alias(f"__e{i}__") for i, q in enumerate(qs)
    ]
    gc = list(group_cols)
    if gc:
        edges = df.groupBy(*gc).agg(*aggs)
        joined = df.join(edges, gc)
    else:
        joined = df.crossJoin(F.broadcast(df.agg(*aggs)))
    # bin = count of interior edges <= y (edges ascend): 0..n_bins-1,
    # with the top edge folded into the last bin (closed upper bound)
    interior = [F.col(f"__e{i}__") for i in range(1, n_bins)]
    b = sum(
        (F.when(y >= e, 1).otherwise(0) for e in interior), F.lit(0)
    )
    return (
        joined.filter(y.isNotNull())
        .select(
            *gc,
            b.alias("bin"),
            *[F.col(f"__e{i}__") for i in range(n_bins + 1)],
        )
        .groupBy(*gc, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.first(f"__e{i}__").alias(f"__e{i}__")
                for i in range(n_bins + 1)
            ],
        )
        .select(
            *gc,
            "bin",
            F.element_at(
                F.array(*[F.col(f"__e{i}__") for i in range(n_bins + 1)]),
                F.col("bin").cast("int") + 1,
            ).alias("lo"),
            F.element_at(
                F.array(*[F.col(f"__e{i}__") for i in range(n_bins + 1)]),
                F.col("bin").cast("int") + 2,
            ).alias("hi"),
            "n",
        )
    )


def group_quality_gate(
    df: DataFrame,
    group_cols: Sequence[str],
    metric_col: str,
    min_rows: int = 1,
    min_mean: float | None = None,
    max_mean: float | None = None,
) -> DataFrame:
    """Admission gate at GROUP granularity — the C4/CommonCrawl "bad
    source" cut: a row survives iff its group (source, domain, shard …)
    has at least ``min_rows`` rows AND a mean ``metric_col`` inside
    [``min_mean``, ``max_mean``]. Dropping whole low-signal groups beats
    per-row filtering when quality failures correlate within origin —
    the standard corpus-curation move this generalizes.

    One partial-agg shuffle computes per-group (count, exact integer
    sum); the verdict relation is |groups|-sized and semi-joins back
    (AQE broadcasts it when small — the normal case: group keys are
    origins, not rows). ``metric_col`` must be integer-typed so the
    mean is an exact ``sum/count`` double, identical on every engine
    (the ``global_running_sum`` contract — rescale doubles to
    cents/micros first).
    """
    vt = dict(df.dtypes).get(metric_col)
    if vt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"group_quality_gate needs an integer metric column (exact, "
            f"order-independent mean), got {metric_col}: {vt} — rescale "
            f"to cents/micros"
        )
    keys = list(group_cols)
    if not keys:
        raise ValueError("group_quality_gate needs at least one group column")
    g = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum(F.col(metric_col).cast("bigint")).alias("__s__"),
    )
    cond = F.col("__n__") >= F.lit(min_rows)
    mean = F.col("__s__").cast("double") / F.col("__n__")
    if min_mean is not None:
        cond = cond & (mean >= F.lit(float(min_mean)))
    if max_mean is not None:
        cond = cond & (mean <= F.lit(float(max_mean)))
    return df.join(g.filter(cond).select(*keys), keys, "left_semi")


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney IJUFKS'02; Machanavajjhala
    ICDE'06) over a set of QUASI-IDENTIFIER columns — the governance
    sibling of ``cascade_delete``: before a dataset ships, every
    quasi-identifier combination must be shared by at least ``k`` rows,
    or those rows are re-identifiable by linkage.

    One partial-combined aggregate over the quasi columns (NULL is a
    legitimate equivalence-class value — SQL GROUP BY semantics, which
    is what a linkage attacker sees too).  With ``sensitive_col`` the
    same pass counts DISTINCT sensitive values per class (l-diversity:
    a k-anonymous class where everyone shares one diagnosis still leaks).

    Output: one row per equivalence class —
    (*quasi_cols, class_size, [l_distinct,] anonymous) — |classes|-sized,
    never row-sized; join it back ``left_semi``/``left_anti`` to split
    releasable rows from suppressed ones.
    """
    keys = list(quasi_cols)
    if not keys:
        raise ValueError("k_anonymity needs at least one quasi-identifier")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("l_distinct"))
    g = df.groupBy(*keys).agg(*aggs)
    return g.select(
        *keys,
        "class_size",
        *(["l_distinct"] if sensitive_col is not None else []),
        (F.col("class_size") >= F.lit(k)).alias("anonymous"),
    )


def suppress_small_classes(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Row-level k-anonymity enforcement: keep only rows whose
    quasi-identifier equivalence class has ≥ ``k`` members (suppression,
    the conservative baseline ahead of generalization hierarchies).
    The audit relation is |classes|-sized; AQE broadcasts the semi-join
    side when small, and the row set never shuffles.
    """
    keys = list(quasi_cols)
    audit = k_anonymity(df, keys, k=k)
    ok = audit.filter(F.col("anonymous")).select(*keys)
    return df.join(ok, keys, "left_semi")


def referential_integrity(
    specs: "Sequence[tuple[str, DataFrame, Sequence[str], DataFrame, Sequence[str]]]",
) -> DataFrame:
    """Referential-integrity audit across a set of FK relationships in one
    relation: for each named (child, child_keys, parent, parent_keys) spec,
    count child rows, NULL-key child rows, and ORPHANS (non-NULL keys with
    no parent) — the cross-table complement to ``expectations``'s
    single-table constraints; at 100 TB the audit runs as one left-anti
    join per FK over keys only (child payload never shuffles; Catalyst
    broadcasts small parents).

    NULL semantics follow SQL FKs: a child row with any NULL key column is
    exempt from the FK check (counted separately as n_null_keys).

    Output: (fk, n_child, n_null_keys, n_orphans, orphan_rate) — one row
    per spec; orphan_rate = n_orphans / non-null child rows (NULL when no
    checkable rows).
    """
    if not specs:
        raise ValueError("referential_integrity needs at least one FK spec")
    parts = []
    for name, child, child_keys, parent, parent_keys in specs:
        if len(child_keys) != len(parent_keys) or not child_keys:
            raise ValueError(
                f"FK {name!r}: child/parent key lists must be same-length "
                f"and non-empty"
            )
        ck = child.select(*[F.col(c) for c in child_keys])
        nonnull = ck
        for c in child_keys:
            nonnull = nonnull.filter(F.col(c).isNotNull())
        pk = parent.select(
            *[F.col(p).alias(c) for c, p in zip(child_keys, parent_keys)]
        ).distinct()
        orphans = nonnull.join(pk, on=list(child_keys), how="left_anti")
        totals = ck.agg(F.count(F.lit(1)).alias("n_child"))
        counted = (
            totals.crossJoin(
                nonnull.agg(F.count(F.lit(1)).alias("__nn__"))
            )
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(
                F.lit(name).alias("fk"),
                "n_child",
                (F.col("n_child") - F.col("__nn__")).alias("n_null_keys"),
                "n_orphans",
                F.when(
                    F.col("__nn__") > 0,
                    F.col("n_orphans").cast("double")
                    / F.col("__nn__").cast("double"),
                ).alias("orphan_rate"),
            )
        )
        parts.append(counted)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Benford's-law expected leading-digit probabilities log10(1 + 1/d),
# inlined as plan literals so NEITHER engine evaluates a libm log at query
# time (cross-engine log rounding is the historical drift class).
_BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_audit(
    df: DataFrame,
    value_col: str,
    group_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """Benford's-law first-digit audit of a positive integer measure —
    the classic fraud/synthetic-data screen: natural multi-scale
    quantities follow P(d) = log10(1 + 1/d); fabricated or clipped ones
    don't. Expected probabilities are PLAN LITERALS (precomputed above),
    observed shares exact divides of exact counts, deviation a row-local
    double — every value engine-portable.

    Input must be integer-typed (the rescale contract: cents/millis) and
    only rows with value >= 1 participate (zero/negative have no leading
    digit). Leading digit extracted from the decimal string — exact.

    Output: (*group_cols, digit, n, n_total, observed_p, expected_p,
    abs_dev), 9 rows per group (absent digits emit n=0 via the digit
    spine so the audit never silently drops a digit).
    """
    if dict(df.dtypes).get(value_col) not in {
        "tinyint", "smallint", "int", "bigint"
    }:
        raise ValueError(
            f"benford_audit needs an integer-typed value column; got "
            f"{dict(df.dtypes).get(value_col)!r} — rescale upstream (cents)"
        )
    gcols = list(group_cols or [])
    spark = df.sparkSession
    pos = df.filter(F.col(value_col) >= 1).select(
        *gcols,
        F.substring(F.col(value_col).cast("string"), 1, 1)
        .cast("int")
        .alias("digit"),
    )
    counts = pos.groupBy(*gcols, "digit").agg(F.count(F.lit(1)).alias("n"))
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    if gcols:
        spine = counts.select(*gcols).distinct().crossJoin(digits)
    else:
        spine = digits
    full = spine.join(counts, on=gcols + ["digit"], how="left").select(
        *gcols, "digit", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    wtot = (
        Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    )
    expected = F.element_at(
        F.array(*[F.lit(_BENFORD_P[d]) for d in range(1, 10)]), F.col("digit")
    )
    out = full.select(
        *gcols,
        "digit",
        "n",
        F.sum("n").over(wtot).alias("n_total"),
        expected.alias("expected_p"),
    ).select(
        *gcols,
        "digit",
        "n",
        "n_total",
        F.when(
            F.col("n_total") > 0,
            F.col("n").cast("double") / F.col("n_total").cast("double"),
        ).alias("observed_p"),
        "expected_p",
    )
    return out.withColumn(
        "abs_dev",
        F.when(
            F.col("observed_p").isNotNull(),
            F.abs(F.col("observed_p") - F.col("expected_p")),
        ),
    )


def gini_coefficient(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-group Gini concentration index over a non-negative integer
    measure (revenue cents, token counts):

        G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx),   x sorted ascending

    — the inequality audit (is 90% of revenue in 1% of customers? is the
    training corpus dominated by one source?). The rank-weighted sum runs
    as exact int64 over one window shuffle (ties broken by value order —
    any permutation of equal values gives the same Σi·x, so the statistic
    is deterministic), and the closed form is a fixed IEEE chain:
    engine-portable. Negative values raise (Gini is undefined); zero-sum
    groups emit NULL; value-NULL rows are dropped before ranking.

    Output: (*group_cols, n, total, gini).
    """
    if not group_cols:
        raise ValueError("gini_coefficient needs at least one group column")
    if dict(df.dtypes).get(value_col) not in {
        "tinyint", "smallint", "int", "bigint"
    }:
        raise ValueError(
            f"gini_coefficient needs an integer-typed value column; got "
            f"{dict(df.dtypes).get(value_col)!r} — rescale upstream (cents)"
        )
    x = F.col(value_col).cast("bigint")
    w = Window.partitionBy(*group_cols).orderBy(F.col("__x__").asc())
    # drop value-NULL rows: they would inflate n and the rank positions
    # while contributing nothing to the sums (ADVICE r09)
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, x.alias("__x__"))
        .withColumn("__i__", F.row_number().over(w))
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x__").alias("total"),
        F.sum(F.col("__i__").cast("bigint") * F.col("__x__")).alias("__iw__"),
        F.min("__x__").alias("__min__"),
    )
    nd = F.col("n").cast("double")
    td = F.col("total").cast("double")
    # the negative-value guard lives INSIDE the output expression — a
    # side-channel check column would be pruned by Catalyst and never fire
    gini = F.when(
        F.col("__min__") < 0,
        F.raise_error(
            F.lit(
                "gini_coefficient: negative values are undefined — "
                "filter or shift upstream"
            )
        ).cast("double"),
    ).otherwise(
        F.when(
            F.col("total") > 0,
            (2.0 * F.col("__iw__").cast("double") - (nd + 1.0) * td)
            / (nd * td),
        )
    )
    return agg.select(*group_cols, "n", "total", gini.alias("gini"))


def fd_violations(
    df: DataFrame,
    lhs_cols: Sequence[str],
    rhs_col: str,
    top_k: int | None = None,
) -> DataFrame:
    """Functional-dependency audit: find LHS keys that map to MORE than
    one RHS value — the schema-contract check behind 'one customer, one
    nation', 'one order, one date' assumptions that silently break
    downstream joins and SCD logic when violated.

    One partial-combined aggregate per (lhs, rhs) pair then per-lhs
    distinct counts — keys only, never payloads. NULL RHS values are a
    distinct value of their own (a NULL-and-value split IS a violation).

    Output: (*lhs_cols, n_rows, n_rhs_values) for violating keys only,
    worst first by n_rhs_values (ties by lhs ascending) — optionally
    capped at ``top_k`` (WindowGroupLimit).
    """
    if not lhs_cols:
        raise ValueError("fd_violations needs at least one LHS column")
    pair = (
        df.groupBy(*lhs_cols, rhs_col)
        .agg(F.count(F.lit(1)).alias("__n__"))
        .groupBy(*lhs_cols)
        .agg(
            F.sum("__n__").alias("n_rows"),
            F.count(F.lit(1)).alias("n_rhs_values"),
        )
        .filter(F.col("n_rhs_values") > 1)
    )
    out = pair.select(*lhs_cols, "n_rows", "n_rhs_values")
    if top_k is not None:
        # global top-k via TakeOrdered (per-partition heaps), never a
        # single-partition row_number window
        out = out.orderBy(
            F.col("n_rhs_values").desc(), *[F.col(c).asc() for c in lhs_cols]
        ).limit(top_k)
    return out


def histogram_tv_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bin_width: int,
) -> DataFrame:
    """Numeric distribution drift between two dataset versions as the
    TOTAL VARIATION distance over equi-width histograms:

        TV = ½ Σ_bins |p_A(bin) − p_B(bin)|  ∈ [0, 1]

    — the libm-free drift statistic (PSI/KL need logs whose cross-engine
    rounding drifts; TV is exact): with integer values the per-bin
    counts are exact, and the sum runs over EXACT INTEGERS via the
    cross-multiplied form Σ|n_Ai·N_B − n_Bi·N_A| (order-independent —
    a double |p_A−p_B| sum would depend on bin reduction order), with
    ONE final double divide by 2·N_A·N_B.

    Shape: one aggregate per side, a full-outer bin join (absent bins
    count 0), one exact-int aggregate. Inputs must be integer-typed
    (the rescale contract).

    Output: one row (n_a, n_b, n_bins, tv) — raises when either side is
    empty (drift vs nothing is undefined).
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    for side, d in (("A", df_a), ("B", df_b)):
        if dict(d.dtypes).get(value_col) not in {
            "tinyint", "smallint", "int", "bigint"
        }:
            raise ValueError(
                f"histogram_tv_drift side {side}: {value_col!r} must be "
                f"integer-typed — rescale upstream (cents, millis)"
            )

    def bins(d: DataFrame, out: str) -> DataFrame:
        return (
            d.select(
                F.floor(F.col(value_col) / bin_width)
                .cast("bigint")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    ha = bins(df_a, "n_a_bin")
    hb = bins(df_b, "n_b_bin")
    joined = ha.join(hb, "bin", "full_outer").select(
        F.coalesce(F.col("n_a_bin"), F.lit(0)).alias("n_a_bin"),
        F.coalesce(F.col("n_b_bin"), F.lit(0)).alias("n_b_bin"),
    )
    tot_a = df_a.agg(F.count(F.lit(1)).alias("n_a"))
    tot_b = df_b.agg(F.count(F.lit(1)).alias("n_b"))
    agg = (
        joined.crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.count(F.lit(1)).alias("n_bins"),
            F.sum(
                F.abs(
                    F.col("n_a_bin").cast("decimal(38,0)") * F.col("n_b")
                    - F.col("n_b_bin").cast("decimal(38,0)") * F.col("n_a")
                )
            ).alias("__l1x__"),
        )
    )
    empty_guard = F.when(
        (F.col("n_a") == 0) | (F.col("n_b") == 0),
        F.raise_error(
            F.lit("histogram_tv_drift: empty side — drift is undefined")
        ).cast("double"),
    )
    tv = empty_guard.otherwise(
        F.col("__l1x__").cast("double")
        / (
            2.0
            * F.col("n_a").cast("double")
            * F.col("n_b").cast("double")
        )
    )
    return agg.select("n_a", "n_b", "n_bins", tv.alias("tv"))


# Two-sided geometric (discrete Laplace) inverse-CDF thresholds at 2^31
# scale for alpha = e^-1 (epsilon = 1, sensitivity-1 counts): a 31-bit
# uniform hash maps to an integer noise draw k in [-12, 12] via pure
# integer comparisons — no libm, engine-exact. Thresholds are
# floor(CDF_k * 2^31) of P(K=k) = (1-a)/(1+a) * a^|k| renormalized over
# the clamped support (tail mass beyond +/-12 is ~3e-6).
_GEOM1_T = [
    (-12, 6097),
    (-11, 22672),
    (-10, 67726),
    (-9, 190197),
    (-8, 523108),
    (-7, 1428052),
    (-6, 3887947),
    (-5, 10574634),
    (-4, 28750933),
    (-3, 78159237),
    (-2, 212464933),
    (-1, 577545664),
    (0, 1569937983),
    (1, 1935018714),
    (2, 2069324410),
    (3, 2118732714),
    (4, 2136909013),
    (5, 2143595700),
    (6, 2146055595),
    (7, 2146960539),
    (8, 2147293450),
    (9, 2147415921),
    (10, 2147460975),
    (11, 2147477550),
]


def dp_count_release(
    df: DataFrame,
    group_cols: Sequence[str],
    release_tag: str = "dp1",
    clamp_nonnegative: bool = True,
) -> DataFrame:
    """Differentially-private count histogram release — the geometric
    mechanism (Ghosh/Roughgarden/Sundararajan STOC'09: the discrete
    Laplace, the universally-optimal noise for sensitivity-1 counting
    queries at epsilon = 1 here): per-group COUNT(*) plus an integer
    noise draw, the release-side sibling of ``k_anonymity`` /
    ``suppress_small_classes`` in the governance family.

    The noise is pseudorandom-but-DETERMINISTIC: a 31-bit portable md5
    hash of ``group-key:release_tag`` pushed through the integer
    inverse-CDF ladder above. That keeps the operator value-oracleable
    and rerun-stable (the same release is reproducible for audit), at
    the standard cost of seeded DP: the seed derivation is part of the
    trust boundary — vary ``release_tag`` per release, never re-release
    the same tag after the data changes (a before/after diff at a fixed
    tag reveals exact deltas).

    Scale shape: one partial-combined count aggregate; the noise is a
    per-GROUP column expression (|groups| rows, not |rows|). Output:
    group_cols + (noisy_count BIGINT) — the true count never leaves the
    operator.
    """
    from pangool_spark.operators.dedup import base_hash_31

    gcols = list(group_cols)
    counts = df.groupBy(*gcols).agg(F.count(F.lit(1)).alias("__true__"))
    h = base_hash_31(
        F.concat_ws(
            ":", *[F.col(c).cast("string") for c in gcols], F.lit(release_tag)
        )
    )
    noise = F.lit(12)
    for k, t in reversed(_GEOM1_T):
        noise = F.when(h < F.lit(t), F.lit(k)).otherwise(noise)
    released = F.col("__true__") + noise.cast("bigint")
    if clamp_nonnegative:
        released = F.greatest(released, F.lit(0).cast("bigint"))
    return counts.select(
        *gcols, released.cast("bigint").alias("noisy_count")
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    step past ``k_anonymity``'s l-diversity: a class can hold many
    DISTINCT sensitive values and still leak if its sensitive
    DISTRIBUTION differs sharply from the table's (e.g. 90% "debt" in
    one zip code vs 10% overall). Per equivalence class, the total-
    variation distance between the class's sensitive distribution and
    the global one; ``close`` iff TV ≤ t.

    Exact integer algebra: with class counts ``c_gs``, class size
    ``n_g``, global counts ``C_s``, total ``N``,
    ``TV_g = Σ_s |c_gs·N − C_s·n_g| / (2·n_g·N)`` — the numerator
    accumulates as exact DECIMAL(38,0) products (order-independent),
    one double division at the boundary, rounded to 9dp (the
    large-int→double conversion is the one step engines may differ on
    by 1 ulp — the moments_events finding). Classes missing a sensitive
    value still pay its global mass: the cell grid is the class
    relation CROSS the |domain|-sized sensitive relation (both
    aggregate-sized — never row-sized), left-filled with 0.

    Output: one row per class — (*quasi_cols, class_size, tv, close).
    NULL is a legitimate value on both sides (GROUP BY semantics), same
    as ``k_anonymity``.
    """
    keys = list(quasi_cols)
    if not keys:
        raise ValueError("t_closeness needs at least one quasi-identifier")
    if not 0.0 <= t <= 1.0:
        raise ValueError(f"t must be in [0, 1], got {t}")
    s = F.col(sensitive_col)
    cells = df.groupBy(*keys, s.alias("__s__")).agg(
        F.count(F.lit(1)).alias("__c__")
    )
    # cells is the |classes|·|domain|-bounded contingency relation and
    # every downstream relation (classes, domain, total, grid) derives
    # from it — localCheckpoint it so Catalyst doesn't inline the same
    # subtree four times and rescan the ROW table once per derivation
    # (the kcore/ktruss lineage pattern; one scan of df total).
    cells = cells.localCheckpoint(eager=True)
    classes = cells.groupBy(*keys).agg(F.sum("__c__").alias("class_size"))
    dom = cells.groupBy("__s__").agg(F.sum("__c__").alias("__cs__"))
    n_total = dom.agg(F.sum("__cs__").alias("__n__"))
    # class × sensitive-domain grid (|classes|·|domain| rows, both
    # aggregate-sized), observed counts left-filled with 0. Null-safe
    # equality on every key: NULL is a legitimate class/sensitive value
    # and must match its own cell (plain SQL `=` would zero it out).
    base = classes.crossJoin(F.broadcast(dom)).alias("__b__")
    obs = cells.alias("__o__")
    cond = [
        F.col(f"__b__.{k}").eqNullSafe(F.col(f"__o__.{k}")) for k in keys
    ]
    cond.append(F.col("__b__.__s__").eqNullSafe(F.col("__o__.__s__")))
    joined = base.join(obs, cond, "left").select(
        *[F.col(f"__b__.{k}") for k in keys],
        F.col("__b__.class_size"),
        F.col("__b__.__cs__"),
        F.col("__o__.__c__"),
    )
    grid = (
        joined.crossJoin(F.broadcast(n_total))
        .select(
            *keys,
            "class_size",
            (
                F.abs(
                    F.coalesce(F.col("__c__"), F.lit(0)).cast("decimal(38,0)")
                    * F.col("__n__")
                    - F.col("__cs__").cast("decimal(38,0)") * F.col("class_size")
                )
            ).alias("__num__"),
            (
                F.col("class_size").cast("decimal(38,0)")
                * F.col("__n__")
                * F.lit(2)
            ).alias("__den__"),
        )
    )
    return (
        grid.groupBy(*keys)
        .agg(
            F.max("class_size").alias("class_size"),
            F.round(
                F.sum("__num__").cast("double")
                / F.max("__den__").cast("double"),
                9,
            ).alias("tv"),
        )
        .select(
            *keys,
            "class_size",
            "tv",
            (F.col("tv") <= F.lit(float(t))).alias("close"),
        )
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bin_width: int,
) -> DataFrame:
    """Population Stability Index between two dataset versions over
    equi-width bins — the credit-risk industry's standard drift gauge
    (rule of thumb: <0.1 stable, 0.1-0.25 shifting, >0.25 broken):

        PSI = Σ_bins (p_B(bin) − p_A(bin)) · ln(p_B(bin)/p_A(bin))

    with A the expected/reference side and B the actual. Empty bins are
    add-1 smoothed over the JOINT bin set (the ``unigram_kl`` contract —
    raw PSI is undefined at zero counts): ``p = (c+1)/(n+B)``.

    Cross-engine determinism (the TV/KL playbook): per-bin counts are
    exact ints; each probability is ONE double division of exact ints;
    the single ln per bin takes the exact-int cross ratio
    ``(c_b+1)(n_a+B) / ((c_a+1)(n_b+B))`` — products ≤ n·B stay under
    2⁵³ for any realistic bin count; per-bin terms are rounded to 9dp
    and the total accumulates as a QUANTIZED integer sum
    (order-independent, hash-stable).

    Output: one row per joint bin — (bin, n_a, n_b, psi_term,
    psi_total) with the total repeated per row (the woe_iv relation
    shape). Raises in-plan when one side is empty (drift vs nothing is
    undefined); two empty sides yield an empty relation.
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    for side, d in (("A", df_a), ("B", df_b)):
        if dict(d.dtypes).get(value_col) not in {
            "tinyint", "smallint", "int", "bigint"
        }:
            raise ValueError(
                f"psi_drift side {side}: {value_col!r} must be "
                f"integer-typed — rescale upstream (cents, millis)"
            )

    def bins(d: DataFrame, out: str) -> DataFrame:
        return (
            d.filter(F.col(value_col).isNotNull())
            .groupBy(
                F.floor(F.col(value_col).cast("bigint") / F.lit(int(bin_width)))
                .cast("bigint")
                .alias("bin")
            )
            .agg(F.count(F.lit(1)).alias(out))
        )

    joint = (
        bins(df_a, "n_a")
        .join(bins(df_b, "n_b"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    w = Window.partitionBy()  # |bins| rows
    tot_a = F.sum("n_a").over(w)
    tot_b = F.sum("n_b").over(w)
    n_bins = F.count(F.lit(1)).over(w)
    p_a = (F.col("n_a") + F.lit(1)).cast("double") / (tot_a + n_bins).cast(
        "double"
    )
    p_b = (F.col("n_b") + F.lit(1)).cast("double") / (tot_b + n_bins).cast(
        "double"
    )
    ratio = (
        (F.col("n_b") + F.lit(1)) * (tot_a + n_bins)
    ).cast("double") / ((F.col("n_a") + F.lit(1)) * (tot_b + n_bins)).cast(
        "double"
    )
    term = F.round((p_b - p_a) * F.log(ratio), 9)
    with_terms = joint.select(
        "bin",
        "n_a",
        "n_b",
        tot_a.alias("__ta__"),
        tot_b.alias("__tb__"),
        term.alias("psi_term"),
    )
    wq = Window.partitionBy()
    total = F.sum(
        F.round(F.col("psi_term") * F.lit(1000000000.0)).cast("bigint")
    ).over(wq) / F.lit(1000000000.0)
    # in-plan guard (the histogram_tv_drift pattern): PSI vs an empty
    # side is undefined — fail the job, don't return a junk number
    guarded = F.when(
        (F.col("__ta__") == 0) | (F.col("__tb__") == 0),
        F.raise_error(
            F.lit("psi_drift: empty side — drift is undefined")
        ).cast("double"),
    ).otherwise(total)
    return with_terms.select(
        "bin", "n_a", "n_b", "psi_term", guarded.alias("psi_total")
    )
