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
