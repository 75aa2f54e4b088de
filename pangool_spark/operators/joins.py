"""Join operators.

The reference's ONE physical join strategy is the reduce-side sort-merge
co-group (SURVEY §2.5): N intermediate schemas share a group-by key; the
reducer sees all tuples of a key across sources, ordered by source
(``addSchemaOrder``) then per-source criteria. Spark-first mapping:

- equi-joins that a reducer would hand-code → ``df.join`` and let Catalyst
  pick broadcast/SMJ/shuffle-hash (AQE re-plans at runtime);
- genuinely custom per-key merge logic → ``cogroup().applyInPandas`` (2
  sources) or tagged union + grouped apply (N sources, via ``JobBuilder``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pangool_spark.orderby import OrderBy
from pangool_spark.plans.job import _sort_pandas
from pangool_spark.schema import Schema


def broadcast_join(
    big: DataFrame, small: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Map-side join the reference lacks as a primitive (users loaded small
    files in ``setup()``, ref ``EX/naivebayes/NaiveBayesClassifier.java:49-72``).
    The broadcast hint guarantees no shuffle of the big side."""
    return big.join(F.broadcast(small), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — expressible-but-absent in the reference (SURVEY §2.5)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — expressible-but-absent in the reference (SURVEY §2.5)."""
    return left.join(right, on, "left_anti")


def cogroup_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    fn: Callable[[tuple, pd.DataFrame, pd.DataFrame], pd.DataFrame],
    output_schema: Schema | T.StructType | str,
    left_order: OrderBy | str | None = None,
    right_order: OrderBy | str | None = None,
) -> DataFrame:
    """Two-source co-group with per-source sorted frames.

    Ref the UrlResolution pattern (``EX/urlresolution/UrlResolution.java:
    46-119``): group on a (possibly aliased) key, dimension rows first
    (schema order), fact rows sorted by their specific criteria. Here each
    side arrives as its own pandas frame — source order is structural — and
    per-source sorts replace ``setSpecificOrderBy``
    (``P/tuplemr/TupleMRConfigBuilder.java:296-343``).
    """
    if isinstance(output_schema, str):
        output_schema = Schema.parse("output", output_schema)
    struct = output_schema.to_struct() if isinstance(output_schema, Schema) else output_schema
    lob = OrderBy.parse(left_order) if isinstance(left_order, str) else left_order
    rob = OrderBy.parse(right_order) if isinstance(right_order, str) else right_order

    def run(key: tuple, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lob is not None:
            lpdf = _sort_pandas(lpdf, lob.elements)
        if rob is not None:
            rpdf = _sort_pandas(rpdf, rob.elements)
        return fn(key, lpdf, rpdf)

    return (
        left.groupBy(*[F.col(c) for c in on])
        .cogroup(right.groupBy(*[F.col(c) for c in on]))
        .applyInPandas(run, schema=struct)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    allow_exact: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: attach to every left row the LATEST right row with the
    same key and ``right.ts <= left.ts`` (``<`` when ``allow_exact=False``)
    — the time-series primitive (kdb `aj`, pandas ``merge_asof``) the
    reference has no counterpart for. ``direction='forward'`` mirrors:
    the EARLIEST right row with ``right.ts >= left.ts`` (``>`` when
    strict), via the same one-exchange plan with the sort reversed.

    Spark-first shape: NOT a range join (whose candidate set is every
    right row earlier than the left row — quadratic per hot key). The two
    sides are tagged and UNIONED, shuffled ONCE on the key, sorted by
    (ts, side) within partitions, and the match is a running
    ``last(payload, ignorenulls)`` window — O(n log n) per key, one
    exchange, and whole-stage-codegen'd end to end. At equal timestamps
    the right row sorts before (``allow_exact``) or after (strict) the
    left row, which is exactly the ≤ / < distinction. Among right rows
    sharing (key, ts) the last by ``right_cols`` order wins —
    deterministic only if (key, ts) is unique on the right, which callers
    should guarantee (dedup first) for reproducible output.

    Output: all left columns, plus each right payload column as
    ``{prefix}{col}`` and the matched timestamp as ``{prefix}{ts_col}``
    (all NULL when no earlier right row exists — a LEFT as-of join).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}: backward|forward")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, ts_col)]
    payload = F.struct(
        *[F.col(c).alias(c) for c in right_cols], F.col(ts_col).alias(ts_col)
    )
    left_struct = F.struct(*[F.col(c).alias(c) for c in left.columns])
    r_side, l_side = (0, 1) if allow_exact else (2, 1)
    tagged_r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts__"),
        F.lit(r_side).alias("__side__"),
        F.lit(None).cast(
            left.select(left_struct).schema[0].dataType
        ).alias("__left__"),
        payload.alias("__payload__"),
    )
    tagged_l = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ts__"),
        F.lit(l_side).alias("__side__"),
        left_struct.alias("__left__"),
        F.lit(None).cast(
            right.select(payload).schema[0].dataType
        ).alias("__payload__"),
    )
    # forward = backward mirrored in time: sort ts DESC so "running last
    # non-null payload" becomes "earliest right row at-or-after the left
    # row"; the side tie-order keeps the same ≤/< meaning under the flip.
    ts_order = (
        F.col("__ts__").asc() if direction == "backward" else F.col("__ts__").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # SQL equality semantics for the join key: a NULL key matches NOTHING
    # (Window.partitionBy would otherwise group all NULL keys into one
    # partition and match them to each other — unlike DuckDB ASOF JOIN and
    # pandas merge_asof). Null-keyed left rows bypass the window and come
    # back with NULL payloads; null-keyed right rows are dropped outright.
    null_key = None
    for k in keys:
        cond = F.col(k).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    matched = (
        tagged_r.filter(~null_key)
        .unionByName(tagged_l.filter(~null_key))
        .withColumn("__match__", F.last("__payload__", ignorenulls=True).over(w))
        .filter(F.col("__side__") == 1)
        .unionByName(
            tagged_l.filter(null_key).withColumn(
                "__match__", F.col("__payload__")  # typed NULL struct
            )
        )
    )
    out_cols = [F.col(f"__left__.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__match__.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    out_cols.append(F.col(f"__match__.{ts_col}").alias(f"{prefix}{ts_col}"))
    return matched.select(*out_cols)


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    fpp: float = 0.01,
    max_filter_mb: int = 64,
) -> DataFrame:
    """Runtime-filter join: build a Bloom filter over the dim side's join
    keys, pre-filter the FACT side with it BEFORE the fact rows reach the
    join's shuffle, then run the real equi-join. The result is EXACTLY
    ``fact.join(dim, on, how)`` — Bloom false positives survive the
    pre-filter but the real join removes them, and matchable rows can
    never be false negatives (equal keys hash to equal bit positions).

    This is the shuffle-volume play behind engine runtime filters
    (Spark's InjectRuntimeFilter, Trino dynamic filtering) made explicit
    and composable: at 100 TB a selective dimension (say 0.1% of parts)
    means 99%+ of fact rows would shuffle only to be dropped by the join;
    probing a broadcast bitset first drops them at the SCAN, paying one
    cheap aggregate over the (small) dim side.

    Everything is JVM expressions — xxhash64 positions, a bit_or word
    aggregate on the dim side, and a whole-stage-codegen probe
    (element_at + bitmask) against the bitset shipped as a broadcast
    single-row relation (a broadcast-scalar BNLJ, the pattern the plan
    audit whitelists). No Python in either path.

    Restricted to ``inner``/``left_semi``: outer joins must keep
    unmatched fact rows, so pre-filtering the fact side would be wrong.
    ``max_filter_mb`` caps the bitset (the broadcast contract); when the
    dim cardinality pushes m beyond it, the filter is clamped and the
    false-positive rate degrades gracefully (correctness is unaffected).
    """
    import math

    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_prune_join: how={how!r} would drop unmatched fact rows; "
            "only inner/left_semi joins can prune the fact side"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    # xxhash64 is TYPE-sensitive (hash(int 5) != hash(bigint 5)): a dtype
    # mismatch between the sides would silently drop matching fact rows
    # (false negatives), so it is a hard error, not an implicit cast.
    fact_types = dict(fact.dtypes)
    dim_types = dict(dim.dtypes)
    for k in keys:
        missing = [
            side
            for side, types in (("fact", fact_types), ("dim", dim_types))
            if k not in types
        ]
        if missing:
            raise ValueError(
                f"bloom_prune_join: key {k!r} is missing from the "
                f"{' and '.join(missing)} side"
            )
        if fact_types.get(k) != dim_types.get(k):
            raise ValueError(
                f"bloom_prune_join: key {k!r} has dtype "
                f"{fact_types.get(k)} on the fact side vs "
                f"{dim_types.get(k)} on the dim side — xxhash64 is "
                "type-sensitive, so mismatched types would produce false "
                "negatives. Cast both sides to one type first."
            )
    if "__bloom__" in fact.columns:
        raise ValueError("bloom_prune_join: fact already has a __bloom__ column")

    n = dim.select(*keys).distinct().count()
    if n == 0:
        # empty dim: inner/semi result is empty; keep the plan trivial
        return fact.join(dim, keys, how)
    ln2 = math.log(2.0)
    m = int(math.ceil(-n * math.log(fpp) / (ln2 * ln2)))
    m = max(64, min(m, max_filter_mb * 1024 * 1024 * 8))
    n_words = (m + 63) // 64
    m = n_words * 64
    k = max(1, min(16, round((m / n) * ln2)))

    key_sql = ", ".join(keys)
    positions = [f"pmod(xxhash64({key_sql}, {i}), {m}L)" for i in range(k)]
    words = (
        dim.select(*keys)
        .distinct()
        .selectExpr(
            f"explode(array({', '.join(positions)})) AS __pos__"
        )
        .selectExpr(
            "cast(__pos__ div 64 AS int) AS __w__",
            "shiftleft(1L, cast(__pos__ % 64 AS int)) AS __mask__",
        )
        .groupBy("__w__")
        .agg(F.bit_or("__mask__").alias("__mask__"))
        .collect()
    )
    bits = [0] * n_words
    for r in words:
        bits[r["__w__"]] = r["__mask__"]

    spark = fact.sparkSession
    from pangool_spark.data import local_relation

    bits_df = local_relation(spark, [(bits,)], "__bloom__ array<bigint>")
    probe = " AND ".join(
        f"(element_at(__bloom__, cast({p} div 64 AS int) + 1) "
        f"& shiftleft(1L, cast({p} % 64 AS int))) != 0"
        for p in positions
    )
    pruned = (
        fact.join(F.broadcast(bits_df))
        .filter(F.expr(probe))
        .drop("__bloom__")
    )
    return pruned.join(dim, keys, how)
