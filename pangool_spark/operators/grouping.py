"""Grouping & aggregation operators.

All algebraic paths compile to native ``groupBy().agg()`` so Catalyst's
partial+final HashAggregate replaces the reference's map-side combiner
(``P/tuplemr/mapred/SimpleCombiner.java:35-117``) — at 100 TB this is the
difference between shuffling raw rows and shuffling partial aggregates.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pangool_spark.orderby import OrderBy
from pangool_spark.plans.job import _sort_pandas
from pangool_spark.schema import Schema


def grouped_agg(df: DataFrame, group_by: Sequence[str], *aggs: Column) -> DataFrame:
    """SQL GROUP BY. Ref ``setGroupByFields``
    (``P/tuplemr/TupleMRConfigBuilder.java:114-142``) + algebraic reducer."""
    return df.groupBy(*group_by).agg(*aggs)


def grouped_count(df: DataFrame, group_by: Sequence[str], count_col: str = "count") -> DataFrame:
    """Word-count shape (ref ``EX/topicalwordcount/TopicalWordCount.java:87-102``)."""
    return df.groupBy(*group_by).agg(F.count(F.lit(1)).alias(count_col))


def rollup_agg(df: DataFrame, group_by: Sequence[str], *aggs: Column) -> DataFrame:
    """Hierarchical aggregate over every prefix level in ONE shuffle.

    Ref single-pass rollup (``P/tuplemr/mapred/RollupReducer.java:129-202``);
    Spark's ``rollup`` compiles to an Expand + one hash aggregate — same
    shuffle count as the reference, plus codegen.
    """
    return df.rollup(*group_by).agg(*aggs)


def cube_agg(df: DataFrame, group_by: Sequence[str], *aggs: Column) -> DataFrame:
    """All grouping-set combinations — absent in the reference (only linear
    rollup); free upgrade via ``df.cube`` (SURVEY §2.4)."""
    return df.cube(*group_by).agg(*aggs)


def secondary_sorted_apply(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: OrderBy | str,
    fn: Callable[[tuple, pd.DataFrame], pd.DataFrame],
    output_schema: Schema | T.StructType | str,
) -> DataFrame:
    """General reducer over groups whose rows arrive sorted.

    Ref secondary sort (``EX/secondarysort/SecondarySort.java:45-132``) +
    ``TupleReducer`` contract (``P/tuplemr/TupleReducer.java:38-99``). The
    intra-group sort happens pandas-side per group (cheap: groups are small);
    the only exchange is the groupBy shuffle — one, like the reference.
    """
    ob = OrderBy.parse(order_by) if isinstance(order_by, str) else order_by
    if isinstance(output_schema, str):
        output_schema = Schema.parse("output", output_schema)
    struct = output_schema.to_struct() if isinstance(output_schema, Schema) else output_schema
    elements = [e for e in ob.elements if e.name not in group_by]

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(key, _sort_pandas(pdf, elements))

    return df.groupBy(*group_by).applyInPandas(run, schema=struct)


_MERGEABLE_FIRST = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_MERGEABLE_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def agg_state(
    df: DataFrame, keys: Sequence[str], aggs: "dict[str, tuple]"
) -> DataFrame:
    """Mergeable aggregation STATE for a batch — the combiner pattern
    (ref ``P/tuplemr/TupleMRBuilder`` combiner wiring, SURVEY §2.4)
    promoted to a standing-table regime: instead of re-aggregating the
    full history every day, keep a state table of algebraic partials and
    fold each new batch in with ``merge_agg_states`` — O(batch + state)
    per day, never O(history).

    ``aggs`` maps output column → (op, input column), op in
    {sum, count, min, max} (the self-mergeable ops; avg = sum/count at
    read time). The state schema is the output schema, so states and
    batches round-trip through any sink.
    """
    for name, (op, _c) in aggs.items():
        if op not in _MERGEABLE_FIRST:
            raise ValueError(
                f"agg_state supports {sorted(_MERGEABLE_FIRST)}, got {op!r} for {name!r}"
            )
    return df.groupBy(*keys).agg(
        *[_MERGEABLE_FIRST[op](c).alias(name) for name, (op, c) in aggs.items()]
    )


def merge_agg_states(
    state: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    aggs: "dict[str, tuple]",
) -> DataFrame:
    """Fold a batch's ``agg_state`` into the standing state: union +
    one re-aggregate with each op's MERGE function (count merges with
    sum). Equals ``agg_state`` over the concatenated raw history —
    pinned by oracle — at the cost of the delta, not the history.
    New keys appear, absent keys carry through unchanged."""
    merged = state.unionByName(delta)
    return merged.groupBy(*keys).agg(
        *[
            _MERGEABLE_MERGE[op](name).alias(name)
            for name, (op, _c) in aggs.items()
        ]
    )


def kmv_state(
    df: DataFrame, keys: Sequence[str], value_col: str, k: int = 64
) -> DataFrame:
    """Mergeable K-minimum-values distinct-count STATE per group — the
    sketch analog of ``agg_state``: each group keeps its k smallest
    md5-derived unit-interval hashes as a sorted array (≤ k·8 bytes of
    state per group regardless of history size). Build one per batch,
    fold batches with ``merge_kmv_states``, read the estimate with
    ``kmv_estimate`` — O(batch + state) per day for an
    approximate-distinct the driver can HASH-VERIFY (the md5 hash is
    deterministic and engine-portable, unlike HLL's).

    Output: (*keys, kmv BIGINT ARRAY sorted ascending).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pangool_spark.operators.dedup import base_hash_31

    h = base_hash_31(F.col(value_col).cast("string"))
    hashes = (
        df.select(*keys, h.alias("__h__"))
        .filter(F.col(value_col).isNotNull())
        .distinct()
    )
    return _k_smallest(hashes, keys, k)


def _k_smallest(hashes: DataFrame, keys: Sequence[str], k: int) -> DataFrame:
    """(keys, __h__) → (keys, kmv): sorted array of the k smallest hashes
    per group. rank ≤ k compiles to WindowGroupLimit — every task keeps a
    k-row heap per group, so the build is CONSTANT-state even when a
    group has billions of distinct hashes (collect_set-then-slice would
    buffer them all first)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy("__h__")
    pruned = (
        hashes.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
    )
    return pruned.groupBy(*keys).agg(
        F.sort_array(F.collect_list("__h__")).alias("kmv")
    )


def merge_kmv_states(
    state: DataFrame, delta: DataFrame, keys: Sequence[str], k: int = 64
) -> DataFrame:
    """Fold a batch's ``kmv_state`` into the standing state: union the
    hash arrays, dedupe, keep the k smallest — equals ``kmv_state`` over
    the concatenated raw history (the merge-equals-recompute contract,
    value-oracled). Groups present in only one side carry over."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    ks = list(keys)
    both = state.select(*ks, "kmv").unionByName(delta.select(*ks, "kmv"))
    merged = both.select(*ks, F.explode("kmv").alias("__h__")).distinct()
    return _k_smallest(merged, ks, k)


def kmv_estimate(state: DataFrame, keys: Sequence[str], k: int = 64) -> DataFrame:
    """Distinct-count estimates from a KMV state: groups holding fewer
    than k hashes report the EXACT count (the sketch's exact regime);
    full sketches report (k−1)/h_(k) with the hash scaled to (0, 1] —
    a fixed exact-rounded double chain, engine-portable."""
    n = F.size("kmv")
    hk = (
        F.element_at("kmv", k).cast("double") / F.lit(2147483647.0)
    )
    est = F.when(n < k, n.cast("bigint")).otherwise(
        F.round(F.lit(float(k - 1)) / hk).cast("bigint")
    )
    return state.select(*keys, est.alias("est_distinct"))


def kmv_intersect(
    a: DataFrame, b: DataFrame, keys: Sequence[str], k: int = 64
) -> DataFrame:
    """Distinct-count of a SET INTERSECTION from two ``kmv_state``
    sketches (Beyer et al. SIGMOD'07) — the cross-dataset overlap
    question ("how many users/tokens do these corpora share?") answered
    from ≤ k·8 bytes per side, never by joining the raw data: the union
    sketch L = k smallest of K_A ∪ K_B is a uniform sample of A ∪ B, so
    est(A∩B) = (|L ∩ K_A ∩ K_B| / |L|) · est(A ∪ B).

    When the merged hash set holds fewer than k values BOTH sets are
    fully enumerated and the answer is exact (the ``kmv_estimate``
    exact-regime contract). Everything is JVM array expressions over
    the joined states — one equi-join on the group keys, no raw-data
    pass — and the md5-derived hashes make even the approximate path
    fully value-oracle-able. Groups present in only one input are
    absent (no sketch, no overlap question). Output: (*keys, n_union,
    n_common, est_intersection).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    ks = list(keys)
    ja = a.select(*ks, F.col("kmv").alias("__ka__"))
    jb = b.select(*ks, F.col("kmv").alias("__kb__"))
    j = ja.join(jb, ks)
    union = F.array_sort(F.array_union("__ka__", "__kb__"))
    inter = F.array_intersect("__ka__", "__kb__")
    nu = F.size(union)
    ell = F.slice(union, 1, k)
    common_in_l = F.size(F.array_intersect(ell, inter))
    hk = F.element_at(ell, k).cast("double") / F.lit(2147483647.0)
    est_union = F.lit(float(k - 1)) / hk
    rho = common_in_l.cast("double") / F.lit(float(k))
    est = F.when(nu < k, F.size(inter).cast("bigint")).otherwise(
        F.round(rho * est_union).cast("bigint")
    )
    return j.select(
        *ks,
        nu.alias("n_union"),
        common_in_l.alias("n_common"),
        est.alias("est_intersection"),
    )
